from esrganplus_tpu.models.rrdb import RRDBNetConfig, init_rrdbnet, rrdbnet_forward, count_params

__all__ = ["RRDBNetConfig", "init_rrdbnet", "rrdbnet_forward", "count_params"]
