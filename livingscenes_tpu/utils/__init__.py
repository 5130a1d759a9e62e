from .io import load_ply, load_json, load_yaml, read_list_from_txt
from .debugging import (
    checkify_nan,
    assert_finite,
    profile_trace,
    StepTimer,
)

__all__ = [
    "load_ply",
    "load_json",
    "load_yaml",
    "read_list_from_txt",
    "checkify_nan",
    "assert_finite",
    "profile_trace",
    "StepTimer",
]
