"""Checkpoint-conversion parity: the ACTUAL reference network (imported
from /root/reference as a read-only oracle, never copied) vs our model with
converted weights — the end-to-end allclose the checkpoint importer must
guarantee."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from lib.network import RtStereoHumanModel  # noqa: F401
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    return RtStereoHumanModel


def _ref_cfg():
    raft = types.SimpleNamespace(
        mixed_precision=False, train_iters=3, val_iters=3,
        corr_implementation="reg", corr_levels=4, corr_radius=4,
        n_downsample=3, n_gru_layers=1, slow_fast_gru=False,
        encoder_dims=[32, 48, 96], hidden_dims=[96, 96, 96])
    gsnet = types.SimpleNamespace(encoder_dims=[32, 48, 96],
                                  decoder_dims=[48, 64, 96],
                                  parm_head_dim=32)
    return types.SimpleNamespace(raft=raft, gsnet=gsnet)


def _make_data(rng, res=128):
    """The reference's data dict (NCHW) + our StereoSample (NHWC)."""
    from gps_gaussian_tpu.utils.containers import SourceView, StereoSample

    def view(off):
        img = rng.normal(scale=0.4, size=(1, res, res, 3)).astype(np.float32)
        mask = np.ones((1, res, res, 1), np.float32)
        intr = np.array([[0.8 * res, 0, res / 2 + off],
                         [0, 0.8 * res, res / 2], [0, 0, 1]], np.float32)
        extr = np.eye(3, 4, dtype=np.float32)
        extr[2, 3] = 2.0
        tf_x = np.float32(-40.0 if off == 0 else 40.0)
        return img, mask, intr, extr, tf_x

    l, r = view(0.0), view(2.0)
    ref_data = {"lmain": {}, "rmain": {}}
    for d, (img, mask, intr, extr, tf_x), other in (
            (ref_data["lmain"], l, r), (ref_data["rmain"], r, l)):
        d["img"] = torch.from_numpy(img).permute(0, 3, 1, 2)
        d["mask"] = torch.from_numpy(mask).permute(0, 3, 1, 2)
        d["intr"] = torch.from_numpy(intr)[None]
        d["ref_intr"] = torch.from_numpy(other[2])[None]
        d["extr"] = torch.from_numpy(extr)[None]
        d["Tf_x"] = torch.tensor([tf_x])

    def sv(x, other):
        img, mask, intr, extr, tf_x = x
        return SourceView(
            img=jnp.asarray(img), mask=jnp.asarray(mask),
            intr=jnp.asarray(intr[None]), ref_intr=jnp.asarray(other[2][None]),
            extr=jnp.asarray(extr[None]), tf_x=jnp.asarray([tf_x]))

    ours = StereoSample(lmain=sv(l, r), rmain=sv(r, l))
    return ref_data, ours


def test_converted_weights_match_reference_forward(ref_modules, rng):
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import make_model
    from gps_gaussian_tpu.utils.torch_import import convert_state_dict

    tmodel = ref_modules(_ref_cfg(), with_gs_render=True)
    tmodel.eval()

    ref_data, batch = _make_data(rng)
    with torch.no_grad():
        ref_out, _, _ = tmodel(ref_data, is_train=False)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)

    cfg = load_config(None)
    model = make_model(cfg, with_gs=True)
    # sanity: converted tree must line up leaf-for-leaf with a fresh init
    init = model.init(jax.random.PRNGKey(0), batch, iters=3, test_mode=True)
    init_paths = {jax.tree_util.keystr(kp): v.shape for kp, v in
                  jax.tree_util.tree_flatten_with_path(init)[0]}
    conv_paths = {jax.tree_util.keystr(kp): np.asarray(v).shape for kp, v in
                  jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert init_paths == conv_paths, (
        set(init_paths) ^ set(conv_paths) or "shape mismatch")

    out = model.apply(variables, batch, iters=3, test_mode=True)

    # disparity maps
    ref_flow_l = ref_out["lmain"]["flow_pred"].numpy()[:, 0]   # (1, H, W)
    ref_flow_r = ref_out["rmain"]["flow_pred"].numpy()[:, 0]
    our_flow = np.asarray(out.final_flow[..., 0])              # (2, H, W)
    np.testing.assert_allclose(our_flow[0], ref_flow_l[0], atol=2e-3)
    np.testing.assert_allclose(our_flow[1], ref_flow_r[0], atol=2e-3)

    # gaussian parameter maps
    for view, gs in (("lmain", out.lmain_gs), ("rmain", out.rmain_gs)):
        ref_rot = ref_out[view]["rot_maps"].numpy().transpose(0, 2, 3, 1)
        ref_scale = ref_out[view]["scale_maps"].numpy().transpose(0, 2, 3, 1)
        ref_op = ref_out[view]["opacity_maps"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(gs.rot), ref_rot, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gs.scale), ref_scale,
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(gs.opacity), ref_op,
                                   atol=1e-3)
        ref_depth = ref_out[view]["depth"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(gs.depth), ref_depth,
                                   atol=1e-3)
