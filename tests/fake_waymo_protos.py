"""Dynamically-built mirror of the waymo_open_dataset protos used by the
gated IO wrappers (eval/waymo_bin.py export_bin, data/waymo_builder.py
build_segment), so those branches execute and are golden-tested without the
Waymo wheel.

The messages are constructed at runtime with google.protobuf descriptors —
no protoc invocation, no vendored generated code. Field names/numbers mirror
the public WOD schema (label.proto / metrics.proto) on a best-effort basis:
the golden-bytes test locks THIS mirror's serialization (deterministic
protobuf wire format); byte-compatibility with an actual Waymo submission
still requires the real wheel, which is exactly the remaining gated surface.
"""
import sys
import types

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_D = descriptor_pb2.FieldDescriptorProto


def _field(msg, name, number, ftype, type_name=None, repeated=False):
    f = msg.field.add()
    f.name = name
    f.number = number
    f.type = ftype
    f.label = _D.LABEL_REPEATED if repeated else _D.LABEL_OPTIONAL
    if type_name:
        f.type_name = type_name
    return f


def build_messages():
    """Returns {name: message class} for Label, Object, Objects, Frame &co."""
    pool = descriptor_pool.DescriptorPool()

    lab = descriptor_pb2.FileDescriptorProto()
    lab.name = "waymo_mirror/label.proto"
    lab.package = "waymo.open_dataset"
    label = lab.message_type.add()
    label.name = "Label"
    box = label.nested_type.add()
    box.name = "Box"
    for i, n in enumerate(
        ["center_x", "center_y", "center_z", "width", "length", "height",
         "heading"]
    ):
        # public schema quirk: width=4, length=5
        _field(box, n, i + 1, _D.TYPE_DOUBLE)
    meta = label.nested_type.add()
    meta.name = "Metadata"
    for i, n in enumerate(["speed_x", "speed_y", "accel_x", "accel_y"]):
        _field(meta, n, i + 1, _D.TYPE_DOUBLE)
    _field(label, "box", 1, _D.TYPE_MESSAGE, ".waymo.open_dataset.Label.Box")
    _field(label, "metadata", 2, _D.TYPE_MESSAGE,
           ".waymo.open_dataset.Label.Metadata")
    _field(label, "type", 3, _D.TYPE_INT32)  # enum in the real schema
    _field(label, "id", 4, _D.TYPE_STRING)
    _field(label, "num_lidar_points_in_box", 5, _D.TYPE_INT32)
    pool.Add(lab)

    met = descriptor_pb2.FileDescriptorProto()
    met.name = "waymo_mirror/metrics.proto"
    met.package = "waymo.open_dataset"
    met.dependency.append(lab.name)
    obj = met.message_type.add()
    obj.name = "Object"
    _field(obj, "object", 1, _D.TYPE_MESSAGE, ".waymo.open_dataset.Label")
    _field(obj, "score", 2, _D.TYPE_FLOAT)
    _field(obj, "overlap_with_nlz", 3, _D.TYPE_BOOL)
    _field(obj, "context_name", 4, _D.TYPE_STRING)
    _field(obj, "frame_timestamp_micros", 5, _D.TYPE_INT64)
    objs = met.message_type.add()
    objs.name = "Objects"
    _field(objs, "objects", 1, _D.TYPE_MESSAGE, ".waymo.open_dataset.Object",
           repeated=True)
    pool.Add(met)

    # minimal dataset.proto surface for build_segment (Frame et al.)
    dat = descriptor_pb2.FileDescriptorProto()
    dat.name = "waymo_mirror/dataset.proto"
    dat.package = "waymo.open_dataset"
    dat.dependency.append(lab.name)
    mat = dat.message_type.add()
    mat.name = "MatrixFloat"
    _field(mat, "data", 1, _D.TYPE_FLOAT, repeated=True)
    shp = dat.message_type.add()
    shp.name = "MatrixShape"
    _field(shp, "dims", 1, _D.TYPE_INT32, repeated=True)
    ri = dat.message_type.add()
    ri.name = "RangeImage"
    _field(ri, "range_image_compressed", 1, _D.TYPE_BYTES)
    tfm = dat.message_type.add()
    tfm.name = "Transform"
    _field(tfm, "transform", 1, _D.TYPE_DOUBLE, repeated=True)
    cal = dat.message_type.add()
    cal.name = "LaserCalibration"
    _field(cal, "name", 1, _D.TYPE_INT32)
    _field(cal, "beam_inclinations", 2, _D.TYPE_DOUBLE, repeated=True)
    _field(cal, "beam_inclination_min", 3, _D.TYPE_DOUBLE)
    _field(cal, "beam_inclination_max", 4, _D.TYPE_DOUBLE)
    _field(cal, "extrinsic", 5, _D.TYPE_MESSAGE,
           ".waymo.open_dataset.Transform")
    ctx = dat.message_type.add()
    ctx.name = "Context"
    _field(ctx, "name", 1, _D.TYPE_STRING)
    _field(ctx, "laser_calibrations", 2, _D.TYPE_MESSAGE,
           ".waymo.open_dataset.LaserCalibration", repeated=True)
    frm = dat.message_type.add()
    frm.name = "Frame"
    _field(frm, "context", 1, _D.TYPE_MESSAGE, ".waymo.open_dataset.Context")
    _field(frm, "timestamp_micros", 2, _D.TYPE_INT64)
    _field(frm, "laser_labels", 3, _D.TYPE_MESSAGE,
           ".waymo.open_dataset.Label", repeated=True)
    pool.Add(dat)

    names = ["Label", "Object", "Objects", "Frame", "Context",
             "LaserCalibration", "Transform", "MatrixFloat", "MatrixShape"]
    return {
        n: message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"waymo.open_dataset.{n}")
        )
        for n in names
    }


def install(monkeypatch=None):
    """Register fake waymo_open_dataset(.protos.metrics_pb2 / .label_pb2 /
    .dataset_pb2) modules in sys.modules; returns the message classes.

    With a pytest ``monkeypatch`` the registration auto-reverts.
    """
    msgs = build_messages()
    root = types.ModuleType("waymo_open_dataset")
    protos = types.ModuleType("waymo_open_dataset.protos")
    metrics = types.ModuleType("waymo_open_dataset.protos.metrics_pb2")
    metrics.Objects = msgs["Objects"]
    metrics.Object = msgs["Object"]
    label_mod = types.ModuleType("waymo_open_dataset.label_pb2")
    label_mod.Label = msgs["Label"]
    dataset_mod = types.ModuleType("waymo_open_dataset.dataset_pb2")
    dataset_mod.Frame = msgs["Frame"]
    root.protos = protos
    root.label_pb2 = label_mod
    root.dataset_pb2 = dataset_mod
    protos.metrics_pb2 = metrics
    mods = {
        "waymo_open_dataset": root,
        "waymo_open_dataset.protos": protos,
        "waymo_open_dataset.protos.metrics_pb2": metrics,
        "waymo_open_dataset.label_pb2": label_mod,
        "waymo_open_dataset.dataset_pb2": dataset_mod,
    }
    for name, mod in mods.items():
        if monkeypatch is not None:
            monkeypatch.setitem(sys.modules, name, mod)
        else:
            sys.modules[name] = mod
    return msgs
