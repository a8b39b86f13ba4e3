from bsvd_tpu.utils.img_util import crop_border, imfrombytes, img2tensor, imwrite, tensor2img
from bsvd_tpu.utils.logger import (AvgTimer, MessageLogger, get_env_info, get_root_logger,
                                   init_tb_logger)
from bsvd_tpu.utils.misc import (check_resume, digit_sort_key, get_time_str, make_exp_dirs,
                                 mkdir_and_rename, scandir, sizeof_fmt)
from bsvd_tpu.utils.options import (copy_opt_file, dict2str, ordered_yaml, parse_options,
                                    set_random_seed, yaml_load)
from bsvd_tpu.utils.registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                                     METRIC_REGISTRY, MODEL_REGISTRY)
