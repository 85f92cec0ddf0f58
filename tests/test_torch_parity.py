"""Numerical parity of network primitives against torch (CPU).

The published checkpoint is torch-trained; the 1e-4 parity budget
(BASELINE.md) hinges on exact primitive semantics: conv padding, BatchNorm
inference form, LayerNorm eps, erf-GELU, cosine attention. These tests
compose torch primitives directly (no reference code) and compare against
our flax modules through the weight converter's layout rules.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _t2j_linear(weight, bias=None):
    out = {"kernel": np.ascontiguousarray(weight.numpy().T)}
    if bias is not None:
        out["bias"] = bias.numpy()
    return out


def test_conv3d_batchnorm_relu_parity():
    """BaseConv3d vs torch Conv3d+BatchNorm3d(eval)+ReLU."""
    from pharmaconet_tpu.network.layers import BaseConv3d

    torch.manual_seed(0)
    conv = torch.nn.Conv3d(5, 7, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm3d(7).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(7) + 0.5)
        bn.bias.copy_(torch.randn(7) * 0.1)
        bn.running_mean.copy_(torch.randn(7) * 0.2)
        bn.running_var.copy_(torch.rand(7) + 0.5)
    x = torch.randn(2, 5, 6, 6, 6)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).numpy()

    params = {
        "params": {
            "conv": {
                "kernel": np.transpose(conv.weight.detach().numpy(), (2, 3, 4, 1, 0))
            },
            "norm": {
                "scale": bn.weight.detach().numpy(),
                "bias": bn.bias.detach().numpy(),
                "mean": bn.running_mean.numpy(),
                "var": bn.running_var.numpy(),
            },
        }
    }
    x_jax = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))  # NDHWC
    out = BaseConv3d(7, kernel_size=3).apply(jax.tree.map(jnp.asarray, params), x_jax)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-5)


def test_layernorm_gelu_mlp_parity():
    """Mlp (erf GELU) + LayerNorm(eps=1e-5) vs torch."""
    from flax import linen as nn

    from pharmaconet_tpu.network.layers import LN_EPS, Mlp

    torch.manual_seed(1)
    fc1 = torch.nn.Linear(16, 64)
    fc2 = torch.nn.Linear(64, 16)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.rand(16) + 0.5)
        ln.bias.copy_(torch.randn(16) * 0.1)
    x = torch.randn(4, 16)
    with torch.no_grad():
        ref = ln(fc2(torch.nn.functional.gelu(fc1(x)))).numpy()

    mlp_params = {
        "params": {"fc1": _t2j_linear(fc1.weight.detach(), fc1.bias.detach()),
                   "fc2": _t2j_linear(fc2.weight.detach(), fc2.bias.detach())}
    }
    hidden = Mlp(64, 16).apply(jax.tree.map(jnp.asarray, mlp_params), jnp.asarray(x.numpy()))
    ln_params = {
        "params": {"scale": jnp.asarray(ln.weight.detach().numpy()),
                   "bias": jnp.asarray(ln.bias.detach().numpy())}
    }
    out = nn.LayerNorm(epsilon=LN_EPS).apply(ln_params, hidden)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-6, rtol=2e-5)


def test_cosine_window_attention_parity():
    """WindowAttention math vs a direct torch composition of the same
    documented semantics (cosine attention, clamped logit scale, CPB)."""
    from pharmaconet_tpu.network.swin3d import (
        WindowAttention,
        make_cpb_table,
        make_relative_position_index,
    )

    torch.manual_seed(2)
    dim, heads, window = 12, 3, 2
    n = window**3
    bw = 4
    qkv = torch.nn.Linear(dim, 3 * dim, bias=False)
    proj = torch.nn.Linear(dim, dim)
    cpb1 = torch.nn.Linear(3, 512)
    cpb2 = torch.nn.Linear(512, heads, bias=False)
    q_bias = torch.randn(dim) * 0.1
    v_bias = torch.randn(dim) * 0.1
    logit_scale = torch.log(10 * torch.ones(heads, 1, 1))
    x = torch.randn(bw, n, dim)

    with torch.no_grad():
        bias_full = torch.cat([q_bias, torch.zeros(dim), v_bias])
        qkv_out = torch.nn.functional.linear(x, qkv.weight, bias_full)
        qkv_out = qkv_out.reshape(bw, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv_out[0], qkv_out[1], qkv_out[2]
        attn = torch.nn.functional.normalize(q, dim=-1) @ torch.nn.functional.normalize(
            k, dim=-1
        ).transpose(-2, -1)
        scale = torch.clamp(logit_scale, max=torch.log(torch.tensor(100.0))).exp()
        attn = attn * scale
        table = torch.from_numpy(make_cpb_table(window))
        rel = cpb2(torch.relu(cpb1(table)))
        index = torch.from_numpy(make_relative_position_index(window)).long().view(-1)
        rel_bias = rel[index].view(n, n, heads).permute(2, 0, 1)
        attn = attn + (16 * torch.sigmoid(rel_bias)).unsqueeze(0)
        attn = attn.softmax(-1)
        ref = proj((attn @ v).transpose(1, 2).reshape(bw, n, dim)).numpy()

    params = {
        "params": {
            "logit_scale": logit_scale.numpy(),
            "qkv_kernel": np.ascontiguousarray(qkv.weight.detach().numpy().T),
            "q_bias": q_bias.numpy(),
            "v_bias": v_bias.numpy(),
            "cpb_fc1": _t2j_linear(cpb1.weight.detach(), cpb1.bias.detach()),
            "cpb_fc2": _t2j_linear(cpb2.weight.detach()),
            "proj": _t2j_linear(proj.weight.detach(), proj.bias.detach()),
        }
    }
    out = WindowAttention(dim, window, heads).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.numpy()), None
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-6, rtol=5e-5)


def test_gaussian_smoothing_parity():
    """Separable device smoothing vs torch depthwise conv3d of the product
    kernel (smoothing.py semantics: normalized 5^3 gaussian, zero pad)."""
    from pharmaconet_tpu.ops.postprocess import gaussian_kernel_1d, gaussian_smooth

    k1 = gaussian_kernel_1d(5, 0.5)
    kernel3 = torch.from_numpy(
        (k1[:, None, None] * k1[None, :, None] * k1[None, None, :])
    ).float()
    kernel3 = kernel3 / kernel3.sum()
    x = torch.rand(3, 16, 16, 16)
    with torch.no_grad():
        padded = torch.nn.functional.pad(x[None], (2, 2, 2, 2, 2, 2))
        weight = kernel3.view(1, 1, 5, 5, 5).repeat(3, 1, 1, 1, 1)
        ref = torch.nn.functional.conv3d(padded, weight, groups=3)[0].numpy()
    out = np.asarray(gaussian_smooth(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-5)
