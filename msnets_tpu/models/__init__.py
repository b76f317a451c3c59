from .gcnet import MSGCNet  # noqa: F401
from .psmnet import MSPSMNet  # noqa: F401
from .layers import soft_argmin, resize_trilinear_align_corners  # noqa: F401


def build_model(model_cfg, remat: bool = False, remat_scope: str = "all"):
    """Model factory by name (reference main_msnet.py:60-65)."""
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16" else jnp.float32
    if model_cfg.name == "MS-GCNet":
        return MSGCNet(max_disp=model_cfg.max_disp,
                       in_channels=model_cfg.in_channels,
                       num_filters=model_cfg.base_filters,
                       quarter_input=model_cfg.quarter_input,
                       mid_deconv_mode=getattr(model_cfg, "mid_deconv_mode",
                                               "dense"),
                       mid_deconv_mode_train=getattr(
                           model_cfg, "mid_deconv_mode_train", "conv_shuffle"),
                       quant_eval=getattr(model_cfg, "quant_eval", False),
                       quant_mode=getattr(model_cfg, "quant_mode", "dynamic"),
                       quant_scope=getattr(model_cfg, "quant_scope", "all"),
                       dtype=dtype, remat=remat)
    if model_cfg.name == "MS-PSMNet":
        return MSPSMNet(max_disp=model_cfg.max_disp,
                        in_channels=model_cfg.in_channels,
                        base_filters=model_cfg.base_filters,
                        upscale=4 if model_cfg.quarter_input else 2,
                        quant_eval=getattr(model_cfg, "quant_eval", False),
                        quant_mode=getattr(model_cfg, "quant_mode", "dynamic"),
                        packed_eval_outer=getattr(model_cfg,
                                                  "packed_eval_outer", True),
                        dtype=dtype, remat=remat, remat_scope=remat_scope)
    raise ValueError(f"No suitable model found: {model_cfg.name}")
