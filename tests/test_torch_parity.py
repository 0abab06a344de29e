"""Deep numerics parity: weight-copied blocks vs literal torch transcriptions
of the reference modules (the allclose landmines of SURVEY.md §7.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from gps_gaussian_tpu.models.encoders import UnetExtractor  # noqa: E402
from gps_gaussian_tpu.models.layers import ResidualBlock  # noqa: E402


def _copy_conv(tconv: tnn.Conv2d, params: dict):
    """flax kernel (H, W, I, O) -> torch (O, I, H, W)."""
    k = np.asarray(params["kernel"])
    tconv.weight.data = torch.from_numpy(k.transpose(3, 2, 0, 1).copy())
    if tconv.bias is not None:
        tconv.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())


def _copy_gn(tgn: tnn.GroupNorm, params: dict):
    tgn.weight.data = torch.from_numpy(np.asarray(params["scale"]).copy())
    tgn.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())


class TorchResidualBlock(tnn.Module):
    """Literal transcription of reference core/extractor.py:6-60."""

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_planes, planes, 3, padding=1,
                                stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.relu = tnn.ReLU()
        g = planes // 8
        self.norm1 = tnn.GroupNorm(g, planes)
        self.norm2 = tnn.GroupNorm(g, planes)
        self.down = None
        if stride != 1 or in_planes != planes:
            self.norm3 = tnn.GroupNorm(g, planes)
            self.down = tnn.Conv2d(in_planes, planes, 1, stride=stride)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.down is not None:
            x = self.norm3(self.down(x))
        return self.relu(x + y)


@pytest.mark.parametrize("stride,in_ch,out_ch", [(1, 32, 32), (2, 32, 48)])
def test_residual_block_matches_torch(rng, stride, in_ch, out_ch):
    x = rng.normal(size=(2, 16, 16, in_ch)).astype(np.float32)
    blk = ResidualBlock(planes=out_ch, stride=stride)
    params = blk.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]

    tblk = TorchResidualBlock(in_ch, out_ch, stride)
    _copy_conv(tblk.conv1, params["conv1"]["Conv_0"])
    _copy_conv(tblk.conv2, params["conv2"]["Conv_0"])
    _copy_gn(tblk.norm1, params["GroupNorm32_0"]["GroupNorm_0"])
    _copy_gn(tblk.norm2, params["GroupNorm32_1"]["GroupNorm_0"])
    if tblk.down is not None:
        _copy_conv(tblk.down, params["downsample"]["Conv_0"])
        _copy_gn(tblk.norm3, params["GroupNorm32_2"]["GroupNorm_0"])

    ours = blk.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tblk(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=2e-5)


def test_unet_extractor_matches_torch_structure(rng):
    """Full encoder vs a torch transcription with copied weights."""
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    enc = UnetExtractor(encoder_dims=(32, 48, 96))
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    class TorchUnet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.in_conv = tnn.Conv2d(3, 32, 5, stride=2, padding=2)
            self.in_gn = tnn.GroupNorm(8, 32)
            self.relu = tnn.ReLU()
            self.r1a = TorchResidualBlock(32, 32)
            self.r1b = TorchResidualBlock(32, 32)
            self.r2a = TorchResidualBlock(32, 48, 2)
            self.r2b = TorchResidualBlock(48, 48)
            self.r3a = TorchResidualBlock(48, 96, 2)
            self.r3b = TorchResidualBlock(96, 96)

        def forward(self, x):
            x = self.relu(self.in_gn(self.in_conv(x)))
            x1 = self.r1b(self.r1a(x))
            x2 = self.r2b(self.r2a(x1))
            x3 = self.r3b(self.r3a(x2))
            return x1, x2, x3

    t = TorchUnet()
    _copy_conv(t.in_conv, p["in_conv"]["Conv_0"])
    _copy_gn(t.in_gn, p["GroupNorm32_0"]["GroupNorm_0"])
    for name, tb in (("res1a", t.r1a), ("res1b", t.r1b), ("res2a", t.r2a),
                     ("res2b", t.r2b), ("res3a", t.r3a), ("res3b", t.r3b)):
        bp = p[name]
        _copy_conv(tb.conv1, bp["conv1"]["Conv_0"])
        _copy_conv(tb.conv2, bp["conv2"]["Conv_0"])
        _copy_gn(tb.norm1, bp["GroupNorm32_0"]["GroupNorm_0"])
        _copy_gn(tb.norm2, bp["GroupNorm32_1"]["GroupNorm_0"])
        if tb.down is not None:
            _copy_conv(tb.down, bp["downsample"]["Conv_0"])
            _copy_gn(tb.norm3, bp["GroupNorm32_2"]["GroupNorm_0"])

    ours = enc.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = t(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   r.permute(0, 2, 3, 1).numpy(), atol=5e-5)


def test_softplus_beta100_clamp_matches_torch(rng):
    """The scale head's Softplus(beta=100) + clamp_max(0.01)
    (reference lib/gs_parm_network.py:45-46, 73)."""
    x = rng.normal(scale=0.1, size=(1000,)).astype(np.float32)
    ours = np.asarray(jnp.minimum(
        jax.nn.softplus(jnp.asarray(x) * 100.0) / 100.0, 0.01))
    ref = torch.clamp_max(tnn.Softplus(beta=100)(torch.from_numpy(x)),
                          0.01).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-7)
