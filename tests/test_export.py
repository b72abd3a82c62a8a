"""Prediction pickle -> export path (JSON fallback; proto gated)."""
import pickle

import numpy as np

from rangedet_tpu.eval.waymo_bin import export_json, load_prediction_pickle


def test_export_json_roundtrip(tmp_path):
    out = {
        "frame_0": {
            "det_xyzlwhyaws": {
                "veh": np.array([[1, 2, 3, 4, 2, 1.5, 0.3, 0.9]], np.float32)
            },
            "meta_info": {"name": "seg", "timestamp_micros": 123},
        },
        "frame_1": {},  # empty frames are skipped
    }
    pkl = tmp_path / "pred.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"frame_0": {}, "frame_1": {}}, f)  # annotation dict
        pickle.dump(out, f)

    anno, loaded = load_prediction_pickle(str(pkl))
    assert set(loaded) == {"frame_0", "frame_1"}

    js = tmp_path / "out.json"
    n = export_json(str(pkl), str(js))
    assert n == 1
    import json

    rows = json.load(open(js))
    assert rows[0]["type"] == 1 and abs(rows[0]["score"] - 0.9) < 1e-6
    assert rows[0]["frame_timestamp_micros"] == 123
