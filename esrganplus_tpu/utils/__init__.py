from esrganplus_tpu.utils.misc import (enable_compile_cache, mkdir_and_rename,
                                        set_random_seed, setup_logger)

__all__ = ["enable_compile_cache", "mkdir_and_rename", "set_random_seed",
           "setup_logger"]
