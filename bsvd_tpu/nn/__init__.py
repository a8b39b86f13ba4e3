from bsvd_tpu.nn.layers import (conv2d, conv_init, pixel_shuffle, get_act, get_norm,
                                norm_init, norm_apply)
from bsvd_tpu.nn.shift import temporal_shift, temporal_shift_chunk
