from maskflownet_tpu.data import (chairs, codecs, hd1k, kitti, paths, sintel,
                                  things3d)
from maskflownet_tpu.data.device_cache import DeviceBatchCache
from maskflownet_tpu.data.loader import Dataset, TrainLoader
from maskflownet_tpu.data.resize import resize_bilinear_np

__all__ = ["Dataset", "DeviceBatchCache", "TrainLoader", "chairs", "codecs",
           "hd1k", "kitti", "paths", "resize_bilinear_np", "sintel",
           "things3d"]
