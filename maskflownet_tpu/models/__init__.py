from maskflownet_tpu.models.maskflownet import (HEAD_SCOPE, MODELS,
                                                ModelConfig, build_model,
                                                maskflownet, maskflownet_s,
                                                resolve_dispatch)

__all__ = ["HEAD_SCOPE", "MODELS", "ModelConfig", "build_model",
           "maskflownet", "maskflownet_s", "resolve_dispatch"]
