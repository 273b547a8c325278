"""STB (Stereo Hand Tracking Benchmark) reader.

Consumes the stb_eval.bin produced by tools/create_stb_db.py (same layout as
the reference's MATLAB converter, data/stb/write_binary_record.m). 6000
evaluation samples; the dataset ships no official training split for this
pipeline (BinaryDbReaderSTB.py:54-63 hard-asserts training off).
"""

from hand3d_tpu.data.codec import FixedLenRecordFile, STB_RECORD_DTYPE

NUM_SAMPLES = {"evaluation": 6000}
DEFAULT_PATHS = {"evaluation": "./data/stb/stb_eval.bin"}


class STBDataset:
    def __init__(self, mode="evaluation", path=None):
        assert mode == "evaluation", "The STB set is not for training!"
        self.mode = mode
        self.path = path or DEFAULT_PATHS[mode]
        self.records = FixedLenRecordFile(self.path, STB_RECORD_DTYPE)
        self.num_samples = len(self.records)
        if path is None and self.num_samples != NUM_SAMPLES[mode]:
            # same guard as RHDDataset: the default official file must have
            # the reference count (BinaryDbReaderSTB.py:60-61)
            raise ValueError(
                f"{self.path} has {self.num_samples} records, expected "
                f"{NUM_SAMPLES[mode]} for STB {mode}; truncated file?"
            )

    def __len__(self):
        return self.num_samples

    @staticmethod
    def raw_from_records(recs):
        return {
            "kp_xyz": recs["kp_xyz"],
            "kp_uv_vis": recs["kp_uv_vis"],
            "image": recs["image"],
        }

    def raw_batch(self, indices):
        return self.raw_from_records(self.records.gather(indices))
