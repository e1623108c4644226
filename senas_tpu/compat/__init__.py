"""Interop with the PyTorch reference framework.

The reference ecosystem's main migration asset is its trained checkpoints
(`checkpint.pth.tar` / `model_best.pth.tar`, utils/utils.py:138-143).
This package translates those — and plain torchvision-style encoder
state_dicts — into this framework's Flax variable trees, so a reference
user can bring their weights instead of retraining.

Public surface:

- ``load_torch_checkpoint(path)`` — torch.load a reference checkpoint.
- ``classify_checkpoint(ckpt)`` — 'search' | 'train' | 'state_dict'.
- ``import_fixed_checkpoint(path_or_ckpt, genotype, depth)`` — fixed
  SenasModel weights (+ run meta) from a train-CLI checkpoint.
- ``import_search_checkpoint(path_or_ckpt, depth, meta_node_num)`` —
  supernet weights (naive or production fused layout) + architecture
  parameters from a search-CLI checkpoint.
- ``import_zoo_checkpoint(path_or_ckpt, model_name)`` — baseline-zoo
  (vendored-smp) model weights from a train-CLI checkpoint, for any of
  the reference factory's 8 smp baselines (``ZOO_MODEL_NAMES``).
- ``translate_resnet_encoder(sd, name)`` — torchvision-style ResNet /
  ResNeXt ImageNet state_dict -> our ResNetEncoder variables (local-file
  replacement for smp's pretrained-weight URLs, encoders/__init__.py:64-71).
- ``set_encoder_variables(variables, enc_vars)`` — graft imported encoder
  weights into a freshly-initialized zoo model's variables.

CLI wrapper: ``tools/import_torch_checkpoint.py`` converts a reference
checkpoint into an Orbax checkpoint directory that the train/test runners
accept via ``--resume``.
"""

from senas_tpu.compat.zoo_import import (ZOO_MODEL_NAMES,
                                         import_zoo_checkpoint,
                                         translate_zoo_model)
from senas_tpu.compat.torch_import import (classify_checkpoint,
                                           import_fixed_checkpoint,
                                           import_search_checkpoint,
                                           load_torch_checkpoint,
                                           set_encoder_variables,
                                           state_dict_to_numpy,
                                           translate_arch_params,
                                           translate_resnet_encoder,
                                           translate_senas_model,
                                           translate_senas_search)

__all__ = [
    "ZOO_MODEL_NAMES",
    "classify_checkpoint",
    "import_fixed_checkpoint",
    "import_search_checkpoint",
    "import_zoo_checkpoint",
    "load_torch_checkpoint",
    "set_encoder_variables",
    "state_dict_to_numpy",
    "translate_arch_params",
    "translate_resnet_encoder",
    "translate_senas_model",
    "translate_senas_search",
    "translate_zoo_model",
]
