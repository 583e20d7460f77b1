"""Tensor-parallel ('model' axis) sharding tests on the virtual CPU mesh.

SURVEY §2.12: the ('data','model') mesh is designed in beyond the
reference's DP-only world. These tests prove the TP rules in
parallel/shardings.py produce working GSPMD programs whose outputs match
the replicated baseline.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from yolo_dbl_tpu.parallel.mesh import make_mesh  # noqa: E402
from yolo_dbl_tpu.parallel.shardings import (  # noqa: E402
    model_parallel_shardings,
    shard_variables,
    spatial_sharding,
)

from .conftest import cpu_devices


def test_sharding_rules_shapes():
    mesh = make_mesh(n_data=4, n_model=2, devices=cpu_devices(8))
    variables = {
        "params": {
            "big_conv": {"kernel": jnp.zeros((3, 3, 256, 256)), "bias": jnp.zeros((256,))},
            "small_conv": {"kernel": jnp.zeros((1, 1, 8, 16))},
            "dense": {"kernel": jnp.zeros((512, 512))},
            "odd": {"kernel": jnp.zeros((3, 3, 64, 129))},  # 129 % 2 != 0
        }
    }
    sh = model_parallel_shardings(variables, mesh)
    p = sh["params"]
    assert p["big_conv"]["kernel"].spec == P(None, None, None, "model")
    assert p["big_conv"]["bias"].spec == P()  # under min_size -> replicated
    assert p["small_conv"]["kernel"].spec == P()  # tiny -> replicated
    assert p["dense"]["kernel"].spec == P(None, "model")
    assert p["odd"]["kernel"].spec == P()  # indivisible out dim


def test_trainstate_copies_get_identical_specs():
    """Round-3 review regression: the O/I alternation must be keyed on the
    kernel, not a global counter over the flatten — a TrainState carries
    params, ema_params, and Adam mu/nu copies of every kernel, and with an
    ODD eligible count a global counter gives copies opposite assignments,
    forcing a reshard on every elementwise Adam/EMA update."""
    import flax.struct

    @flax.struct.dataclass
    class FakeState:
        params: dict
        ema_params: dict
        opt_state: tuple

    mesh = make_mesh(n_data=4, n_model=2, devices=cpu_devices(8))
    # three eligible kernels (odd) in dataflow order
    tree = {f"c{i}": {"kernel": jnp.zeros((3, 3, 256, 256))} for i in range(3)}
    import collections

    Adam = collections.namedtuple("Adam", ["mu", "nu"])
    state = FakeState(params=tree, ema_params=tree, opt_state=(Adam(mu=tree, nu=tree),))
    sh = model_parallel_shardings(state, mesh)
    copies = [sh.params, sh.ema_params, sh.opt_state[0].mu, sh.opt_state[0].nu]
    for name in ("c0", "c1", "c2"):
        specs = {c[name]["kernel"].spec for c in copies}
        assert len(specs) == 1, f"{name}: copies disagree: {specs}"
    # and the chain itself alternates column -> row -> column
    assert sh.params["c0"]["kernel"].spec == P(None, None, None, "model")
    assert sh.params["c1"]["kernel"].spec == P(None, None, "model", None)
    assert sh.params["c2"]["kernel"].spec == P(None, None, None, "model")


@pytest.mark.slow
def test_tp_predict_matches_replicated():
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    mesh = make_mesh(n_data=4, n_model=2, devices=cpu_devices(8))
    m = DetectionModel("yolov8n.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32))

    want = np.asarray(m.predict(v, x))

    v_tp = shard_variables(v, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(jax.jit(lambda vv, im: m.predict(vv, im))(v_tp, xs))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


def test_alternating_rule_assigns_both_dims():
    """VERDICT r2 #10: the TP rule is Megatron-style alternating — eligible
    conv kernels split between column-parallel (O) and row-parallel (I)."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    mesh = make_mesh(n_data=4, n_model=2, devices=cpu_devices(8))
    m = DetectionModel("yolov13s_DBL.yaml", nc=3)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), imgsz=64))
    sh = model_parallel_shardings(v, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
    n_out = sum(1 for s in specs if s == P(None, None, None, "model"))
    n_in = sum(1 for s in specs if s == P(None, None, "model", None))
    assert n_out > 10 and n_in > 10, (n_out, n_in)
    # uniform-O mode still available for comparison
    sh_u = model_parallel_shardings(v, mesh, alternate=False)
    specs_u = [s.spec for s in jax.tree_util.tree_leaves(sh_u)]
    assert not any(s == P(None, None, "model", None) for s in specs_u)


@pytest.mark.slow
def test_tp_predict_matches_replicated_flagship_128():
    """Alternating TP on the DBL flagship at 128px == replicated forward
    (VERDICT r2 #10 'done' criterion)."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    mesh = make_mesh(n_data=2, n_model=4, devices=cpu_devices(8))
    m = DetectionModel("yolov13s_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 128, 128, 3).astype(np.float32))

    want = np.asarray(m.predict(v, x))
    v_tp = shard_variables(v, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(jax.jit(lambda vv, im: m.predict(vv, im))(v_tp, xs))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3), np.abs(got - want).max()


@pytest.mark.slow
def test_spatial_sharding_compiles_and_matches():
    """SP: rows sharded over 'model' — XLA inserts conv halo exchanges."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    mesh = make_mesh(n_data=4, n_model=2, devices=cpu_devices(8))
    m = DetectionModel("yolov8n.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 64, 64, 3).astype(np.float32))

    want = np.asarray(m.predict(v, x))
    xs = jax.device_put(x, spatial_sharding(mesh))
    repl = jax.device_put(v, NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(lambda vv, im: m.predict(vv, im))(repl, xs))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()
