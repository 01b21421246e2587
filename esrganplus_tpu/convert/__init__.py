from esrganplus_tpu.convert.pth import (
    infer_rrdbnet_config,
    load_state_dict,
    rrdbnet_from_state_dict,
    rrdbnet_to_state_dict,
)

__all__ = [
    "infer_rrdbnet_config",
    "load_state_dict",
    "rrdbnet_from_state_dict",
    "rrdbnet_to_state_dict",
]
