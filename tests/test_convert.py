"""Cross-layout (planar <-> nhwc) parameter conversion: exact tree match,
matching model outputs, exact roundtrip."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.models.convert import convert_params
from tiny import tiny_config


@pytest.mark.heavy
def test_layout_conversion_equivalence():
    cfg_p = tiny_config().replace(layout="planar")
    cfg_n = tiny_config().replace(layout="nhwc")
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(cfg_p, 1, seed=0, num_boxes=4).items()
    }
    mp = RangeDet(**cfg_p.model_kwargs())
    mn = RangeDet(**cfg_n.model_kwargs())
    vp = jax.jit(mp.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch["input_data"], batch["coord"], False
    )

    converted = convert_params(vp["params"], "nhwc")
    ref = jax.jit(mn.init, static_argnums=(3,))(
        jax.random.PRNGKey(1), batch["input_data"], batch["coord"], False
    )
    paths = lambda t: {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(converted) == paths(ref["params"])

    out_p = mp.apply(
        {"params": vp["params"], "batch_stats": vp["batch_stats"]},
        batch["input_data"], batch["coord"], False,
    )
    out_n = mn.apply(
        {"params": converted, "batch_stats": vp["batch_stats"]},
        batch["input_data"], batch["coord"], False,
    )
    for a, b in zip(out_p[0] + out_p[1], out_n[0] + out_n[1]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-3
        )

    back = convert_params(converted, "planar")
    for a, b in zip(jax.tree.leaves(vp["params"]), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
