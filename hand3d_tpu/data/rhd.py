"""RHD (Rendered Handpose Dataset) reader.

Consumes the same rhd_{training,evaluation}.bin files as the reference
(produced by tools/create_binary_db.py; layout in hand3d_tpu.data.codec).
Sample counts per data/BinaryDbReader.py:59-64.
"""

from hand3d_tpu.data.codec import FixedLenRecordFile, RHD_RECORD_DTYPE

NUM_SAMPLES = {"training": 41258, "evaluation": 2728}
DEFAULT_PATHS = {
    "training": "./data/bin/rhd_training.bin",
    "evaluation": "./data/bin/rhd_evaluation.bin",
}


class RHDDataset:
    def __init__(self, mode, path=None):
        assert mode in NUM_SAMPLES, f"Unknown dataset mode: {mode}"
        self.mode = mode
        self.path = path or DEFAULT_PATHS[mode]
        self.records = FixedLenRecordFile(self.path, RHD_RECORD_DTYPE)
        self.num_samples = len(self.records)
        if path is None and self.num_samples != NUM_SAMPLES[mode]:
            # custom .bin files (tests, subsets) pass an explicit path; the
            # default official files must match the reference counts —
            # a truncated download or a wrong-mode file silently shifts
            # every benchmark number otherwise
            raise ValueError(
                f"{self.path} has {self.num_samples} records, expected "
                f"{NUM_SAMPLES[mode]} for RHD {mode} "
                "(BinaryDbReader.py:59-64); truncated or wrong-mode file?"
            )

    def __len__(self):
        return self.num_samples

    @staticmethod
    def raw_from_records(recs):
        return {
            "kp_xyz": recs["kp_xyz"],
            "kp_uv": recs["kp_uv"],
            "cam_mat": recs["cam_mat"],
            "image": recs["image"],
            "hand_parts": recs["hand_parts"],
            "kp_vis": recs["kp_vis"],
        }

    def raw_batch(self, indices):
        """Materialize records as a dict of numpy arrays (host-side only)."""
        return self.raw_from_records(self.records.gather(indices))
