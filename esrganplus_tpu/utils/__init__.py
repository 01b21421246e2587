from esrganplus_tpu.utils.misc import mkdir_and_rename, set_random_seed, setup_logger

__all__ = ["mkdir_and_rename", "set_random_seed", "setup_logger"]
