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


GOLDEN_BIN_HEX = (
    "0a590a450a3f09000000000000f03f1100000000000000401900000000000008402100"
    "0000000000004029000000000000124031000000000000f83f39000000000000d03f18"
    "012200150000603f220673656763747828959aef3a"
)


def test_export_bin_with_fake_protos(tmp_path, monkeypatch):
    """VERDICT r2 #5: execute the metrics_pb2 branch of export_bin against
    the dynamically-built proto mirror (tests/fake_waymo_protos.py) and lock
    its serialization with a golden-bytes check + parse-back."""
    from fake_waymo_protos import install

    msgs = install(monkeypatch)
    # reimport nothing: export_bin does its own deferred import, which now
    # resolves to the fake modules
    from rangedet_tpu.eval.waymo_bin import export_bin

    out = {
        "frame_0": {
            "det_xyzlwhyaws": {
                "veh": np.array(
                    [[1.0, 2.0, 3.0, 4.5, 2.0, 1.5, 0.25, 0.875]], np.float32
                )
            },
            "meta_info": {"name": "segctx", "timestamp_micros": 123456789},
        },
        "frame_1": {},  # skipped
    }
    pkl = tmp_path / "p.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({}, f)
        pickle.dump(out, f)
    bin_path = tmp_path / "o.bin"
    n = export_bin(str(pkl), str(bin_path))
    assert n == 1
    data = open(bin_path, "rb").read()
    assert data.hex() == GOLDEN_BIN_HEX

    # parse back through the proto class: field-level round trip
    objs = msgs["Objects"]()
    objs.ParseFromString(data)
    assert len(objs.objects) == 1
    o = objs.objects[0]
    assert o.context_name == "segctx"
    assert o.frame_timestamp_micros == 123456789
    assert o.object.type == 1
    np.testing.assert_allclose(
        [o.object.box.center_x, o.object.box.center_y, o.object.box.center_z,
         o.object.box.length, o.object.box.width, o.object.box.height,
         o.object.box.heading],
        [1.0, 2.0, 3.0, 4.5, 2.0, 1.5, 0.25],
    )
    np.testing.assert_allclose(o.score, 0.875)
