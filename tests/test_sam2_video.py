"""SAM2 video predictor state machine: memory bank, eviction, occlusion.

Reference behavior: models/sam/predict.py SAM2VideoPredictor — conditioning
memories never evicted, non-conditioning FIFO bounded by num_maskmem-1,
object pointers appended to memory keys, occlusion gating on the score.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_dbl_tpu.models.sam2_video import SAM2VideoPredictor  # noqa: E402


@pytest.fixture(scope="module")
def vp():
    # tiny geometry: 128px image → 8×8 stride-16 grid keeps CPU compile fast
    return SAM2VideoPredictor(size="t", image_size=128, num_maskmem=3, occlusion_thresh=-1e9)


def _frame(seed):
    return np.random.RandomState(seed).rand(128, 128, 3).astype(np.float32)


@pytest.mark.slow
def test_video_tracking_bank_mechanics(vp):
    mask, score = vp.add_new_points(1, _frame(0), points=[[60, 60]], labels=[1])
    assert mask.shape == (128, 128) and np.isfinite(mask).all()
    st = vp.objects[1]
    assert len(st.cond) == 1 and len(st.recent) == 0

    for i in range(4):
        mask, score, visible = vp.track(1, _frame(i + 1))
        assert mask.shape == (128, 128) and np.isfinite(score)
        assert visible  # threshold -inf: always visible
    # FIFO bounded at num_maskmem-1 = 2; conditioning frame never evicted
    assert len(st.cond) == 1
    assert len(st.recent) == 2
    # eviction kept the most recent frames
    assert [f.frame_idx for f in st.recent] == [st.frames_tracked - 1, st.frames_tracked]
    # memory bank tokens: (1 cond + 2 recent) * 64 grid + pointer tokens
    memories, memory_pos, n_ptr = vp._bank(st)
    assert memories.shape[1] == 3 * 64 + n_ptr
    assert n_ptr == 3 * (256 // vp.mem_dim)
    assert memories.shape == memory_pos.shape


@pytest.mark.slow
def test_occlusion_gating(vp):
    vp.reset_state()
    vp.add_new_points(7, _frame(10), points=[[30, 40]], labels=[1])
    st = vp.objects[7]
    # force occlusion: raise the threshold so any score counts as occluded
    vp.occlusion_thresh = 1e9
    mask, score, visible = vp.track(7, _frame(11))
    assert not visible
    assert (mask <= -10.0 + 1e-6).all()  # suppressed mask
    assert len(st.recent) == 0  # occluded frame not inserted into the bank
    ptr_before = st.last_visible_ptr
    # object reappears
    vp.occlusion_thresh = -1e9
    mask, score, visible = vp.track(7, _frame(12))
    assert visible and len(st.recent) == 1
    assert st.last_visible_ptr is not ptr_before  # pointer refreshed
