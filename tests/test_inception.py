"""InceptionV3 FID detector: architecture + converter parity vs a torch
oracle.

The oracle below is the pytorch-fid graph (torchvision `inception_v3` with
the three FID patches: count_include_pad=False average pool branches, max
pool branch in Mixed_7c, 1008-way fc) — the same architecture as the
reference's hardcoded `inception-2015-12-05.pkl` detector
(`src/metrics/frechet_inception_distance.py:23-24`). Random weights + BN
running stats exercise the exact numerics of `convert_inception_v3`'s BN
folding, so the day real weights land the conversion is already proven.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax

from panic3d_tpu.eval.inception import InceptionV3, init_inception
from panic3d_tpu.runtime.convert import convert_inception_v3

# the full-graph parity test compiles a 299² InceptionV3 (~3 min on this
# 1-core host) — slow tier; only the cheap preprocess check is `fast`.


# ---------------------------------------------------------------------------
# torch oracle (pytorch-fid layout; layer names match torchvision so the
# state_dict is checkpoint-shaped)

class TConv(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TA(nn.Module):
    def __init__(self, cin, pf):
        super().__init__()
        self.branch1x1 = TConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = TConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = TConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TConv(cin, pf, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avg(x))], 1)


class TB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd, F.max_pool2d(x, 3, 2)], 1)


class TC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = TConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = TConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class TD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = TConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class TE(nn.Module):
    def __init__(self, cin, pool_max=False):
        super().__init__()
        self.pool_max = pool_max
        self.branch1x1 = TConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = TConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = TConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pool = (F.max_pool2d(x, 3, stride=1, padding=1) if self.pool_max
                else _avg(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pool)], 1)


class TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TConv(80, 192, kernel_size=3)
        self.Mixed_5b = TA(192, 32)
        self.Mixed_5c = TA(256, 64)
        self.Mixed_5d = TA(288, 64)
        self.Mixed_6a = TB(288)
        self.Mixed_6b = TC(768, 128)
        self.Mixed_6c = TC(768, 160)
        self.Mixed_6d = TC(768, 160)
        self.Mixed_6e = TC(768, 192)
        self.Mixed_7a = TD(768)
        self.Mixed_7b = TE(1280)
        self.Mixed_7c = TE(2048, pool_max=True)
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x, no_output_bias=False):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        feat = x.mean(dim=(2, 3))
        logits = feat @ self.fc.weight.T
        if not no_output_bias:
            logits = logits + self.fc.bias
        return feat, torch.softmax(logits, dim=1)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    model = TorchFIDInception()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return model.eval()


def test_inception_converter_parity(oracle):
    """Converted random torch weights drive the flax net to the oracle's
    features AND class probs (BN folding exact to fp32 rounding)."""
    variables = convert_inception_v3(oracle.state_dict())
    net, init_vars = init_inception()
    # converted tree is structurally identical to the module's own init
    flat_c = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(init_vars)[0]
    assert [p for p, _ in flat_c] == [p for p, _ in flat_i]
    assert all(a.shape == b.shape for (_, a), (_, b) in zip(flat_c, flat_i))

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 299, 299).astype(np.float32) * 2 - 1
    with torch.no_grad():
        feat_t, probs_t = oracle(torch.from_numpy(x))
    feat_j = np.asarray(net.apply(variables, x))
    probs_j = np.asarray(net.apply(variables, x, return_features=False))
    assert feat_j.shape == (2, 2048)
    np.testing.assert_allclose(feat_j, feat_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(probs_j, probs_t.numpy(), atol=1e-5)

    # IS protocol: no_output_bias matches inception_score.py:23
    with torch.no_grad():
        _, probs_nb_t = oracle(torch.from_numpy(x), no_output_bias=True)
    probs_nb_j = np.asarray(
        net.apply(variables, x, return_features=False, no_output_bias=True))
    np.testing.assert_allclose(probs_nb_j, probs_nb_t.numpy(), atol=1e-5)


@pytest.mark.fast
@pytest.mark.parametrize("size", [64, 512])
def test_inception_preprocess_matches_torch_resize(size):
    """preprocess = bilinear align_corners=False to 299 + range map — for
    BOTH directions; 512->299 is the flagship's downscale, where an
    antialiased resize would diverge from the torch pipe."""
    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, size, size).astype(np.float32)  # [0,1] domain
    out = np.asarray(InceptionV3.preprocess(img, in_range=(0.0, 1.0)))
    ref = F.interpolate(torch.from_numpy(img) * 2 - 1, size=(299, 299),
                        mode="bilinear", align_corners=False).numpy()
    assert out.shape == (1, 3, 299, 299)
    np.testing.assert_allclose(out, ref, atol=1e-5)
