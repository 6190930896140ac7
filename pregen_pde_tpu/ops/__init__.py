from pregen_pde_tpu.ops import upfirdn2d  # the module; its main op is upfirdn2d.upfirdn2d
from pregen_pde_tpu.ops.bias_act import activation_funcs, bias_act
from pregen_pde_tpu.ops.conv2d_resample import conv2d_resample
from pregen_pde_tpu.ops.filter_design import design_lowpass_filter, setup_filter
from pregen_pde_tpu.ops.filtered_lrelu import filtered_lrelu

__all__ = [
    "activation_funcs",
    "bias_act",
    "conv2d_resample",
    "design_lowpass_filter",
    "setup_filter",
    "filtered_lrelu",
    "upfirdn2d",
]
