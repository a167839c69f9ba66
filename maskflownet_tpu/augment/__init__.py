from maskflownet_tpu.augment.color import ColorAugConfig, color_augmentation
from maskflownet_tpu.augment.geometry import (GeometryAugConfig,
                                              geometry_augmentation)

__all__ = ["ColorAugConfig", "GeometryAugConfig", "color_augmentation",
           "geometry_augmentation"]
