"""Interop with the reference implementation's artifact formats."""

from mvip_tpu.interop.torch_ckpt import (
    band_permutation,
    export_nerf_state_dict,
    export_reference_checkpoint,
    import_nerf_state_dict,
    import_reference_checkpoint,
    infer_mlp_config,
)

__all__ = [
    "band_permutation",
    "export_nerf_state_dict",
    "export_reference_checkpoint",
    "import_nerf_state_dict",
    "import_reference_checkpoint",
    "infer_mlp_config",
]
