from .vec_layers import (
    VecLinear,
    VecActivation,
    VecLNA,
    VecResBlock,
    channel_equi_vec_normalize,
    safe_divide,
)
from .vec_dgcnn_attn import VecDGCNNAttn
from .deepsdf import DeepSDFDecoder, DecoderCat, WNDense

__all__ = [
    "VecLinear",
    "VecActivation",
    "VecLNA",
    "VecResBlock",
    "channel_equi_vec_normalize",
    "safe_divide",
    "VecDGCNNAttn",
    "DeepSDFDecoder",
    "DecoderCat",
    "WNDense",
]
