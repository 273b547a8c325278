from hand3d_tpu.data.codec import (
    RHD_RECORD_DTYPE,
    STB_RECORD_DTYPE,
    FixedLenRecordFile,
)
from hand3d_tpu.data.config import PreprocessConfig
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.data.stb import STBDataset
from hand3d_tpu.data.pipeline import InputPipeline

__all__ = [
    "RHD_RECORD_DTYPE",
    "STB_RECORD_DTYPE",
    "FixedLenRecordFile",
    "PreprocessConfig",
    "RHDDataset",
    "STBDataset",
    "InputPipeline",
]
