from bsvd_tpu.convert.torch_ckpt import (convert_tsn_state_dict, load_params,
                                         params_to_tsn_state_dict)
