from countr_tpu.ops.posembed import get_2d_sincos_pos_embed  # noqa: F401
from countr_tpu.ops.norms import layer_norm, group_norm, instance_norm  # noqa: F401
from countr_tpu.ops.upsample import upsample2x_bilinear, resize_bilinear  # noqa: F401
from countr_tpu.ops.attention import multi_head_attention  # noqa: F401
