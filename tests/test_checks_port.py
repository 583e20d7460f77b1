"""Unit tests: imgsz checks, ray-tune fallback, weight-port path mapping."""

import numpy as np
import pytest

from yolo_dbl_tpu.utils.checks import check_imgsz
from yolo_dbl_tpu.utils.port import _merge_path
from yolo_dbl_tpu.utils.raytune import DEFAULT_SPACE, run_ray_tune


def test_check_imgsz_rounds_up():
    assert check_imgsz(640, 32) == 640
    assert check_imgsz(641, 32) == 672
    assert check_imgsz(100, 32) == 128
    assert check_imgsz([100, 640], 32) == [128, 640]


def test_merge_path_rules():
    assert _merge_path("model.0.conv.weight") == (["m0", "conv"], "weight")
    assert _merge_path("model.6.0.cv1.conv.weight") == (["m6_0", "cv1", "conv"], "weight")
    assert _merge_path("model.21.cv3.0.1.1.bn.bias") == (["m21", "cv3_0_1_1", "bn"], "bias")
    # Sequential(Linear, GELU) collapse
    assert _merge_path("model.12.branch1.m.hgnn.edge_proj.0.weight") == (
        ["m12", "branch1", "m", "hgnn", "edge_proj"], "weight")
    assert _merge_path("model.24.offset.bias") == (["m24", "offset"], "bias")


def test_port_state_dict_small_model():
    """Round-trip a tiny torch conv+bn stack into a matching flax tree."""
    torch = pytest.importorskip("torch")
    jax = pytest.importorskip("jax")
    import flax.linen as fnn
    import jax.numpy as jnp

    from yolo_dbl_tpu.nn.common import Conv
    from yolo_dbl_tpu.utils.port import port_state_dict

    tm = torch.nn.Sequential()
    conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.03)
    torch.nn.init.normal_(conv.weight)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return Conv(8, 3, act=False, name="m0")(x, train)

    m = M()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    state = {"model.0.conv.weight": conv.weight, "model.0.bn.weight": bn.weight,
             "model.0.bn.bias": bn.bias, "model.0.bn.running_mean": bn.running_mean,
             "model.0.bn.running_var": bn.running_var,
             "model.0.bn.num_batches_tracked": bn.num_batches_tracked}
    v2 = port_state_dict(state, v, strict=True)

    x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    with torch.inference_mode():
        bn.eval()
        t_out = bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    j_out = np.asarray(m.apply(v2, jnp.asarray(x))).transpose(0, 3, 1, 2)
    assert np.allclose(t_out, j_out, atol=1e-5), np.abs(t_out - j_out).max()


def test_raytune_fallback_runs():
    space = {k: DEFAULT_SPACE[k] for k in ("lr0", "momentum")}
    calls = []

    def train_fn(hyp):
        calls.append(hyp)
        return -abs(hyp["lr0"] - 0.01)

    out = run_ray_tune(train_fn, space=space, max_samples=4)
    assert out["backend"] == "mutation"
    assert len(calls) >= 4
    assert set(out["best_hyp"]) == {"lr0", "momentum"}
