from categoricalnf_tpu.utils.config import (get_param_val, load_config,
                                            save_config, set_seed)

__all__ = ["get_param_val", "load_config", "save_config", "set_seed"]
