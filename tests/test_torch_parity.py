"""Numerics parity vs torch (CPU): BN semantics, conv padding, losses, PFN.

The reference stack is torch; AP parity hinges on matching BatchNorm
(eps=1e-3, momentum=0.01, biased/unbiased variance split), the
ZeroPad+strided-conv geometry, ConvTranspose upsampling, and the exact loss
formulas.  torch (CPU) is available in the image, so we check our flax/jnp
implementations against live torch modules with copied weights.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F


def test_batchnorm_train_eval_and_running_stats():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.layers import TorchBatchNorm

    rng = np.random.RandomState(0)
    c = 16
    bn_t = nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
    bn_t.weight.data = torch.tensor(rng.randn(c).astype(np.float32))
    bn_t.bias.data = torch.tensor(rng.randn(c).astype(np.float32))

    bn_j = TorchBatchNorm(c)
    x0 = rng.randn(64, c).astype(np.float32)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x0), train=True)
    variables = {
        'params': {'scale': jnp.asarray(bn_t.weight.data.numpy()),
                   'bias': jnp.asarray(bn_t.bias.data.numpy())},
        'batch_stats': variables['batch_stats'],
    }

    stats = variables['batch_stats']
    for step in range(3):
        x = rng.randn(64, c).astype(np.float32)
        with torch.no_grad():
            y_t = bn_t(torch.tensor(x)).numpy()
        y_j, updated = bn_j.apply(
            {'params': variables['params'], 'batch_stats': stats},
            jnp.asarray(x), True, mutable=['batch_stats'])
        stats = updated['batch_stats']
        np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(stats['mean']),
                               bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats['var']),
                               bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    bn_t.eval()
    x = rng.randn(64, c).astype(np.float32)
    with torch.no_grad():
        y_t = bn_t(torch.tensor(x)).numpy()
    y_j = bn_j.apply({'params': variables['params'], 'batch_stats': stats},
                     jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-4)


def test_conv_block_matches_torch_zeropad_strided():
    """RPNV2 block geometry: ZeroPad2d(1) + Conv2d(3, stride 2) == our
    padding=1 stride-2 conv (reference rpn_head.py:236-241)."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.layers import TorchConv

    rng = np.random.RandomState(1)
    cin, cout, h, w = 8, 12, 17, 23   # odd sizes stress the padding math
    x = rng.randn(2, cin, h, w).astype(np.float32)

    conv_t = nn.Conv2d(cin, cout, 3, stride=2, bias=False)
    w_t = rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.1
    conv_t.weight.data = torch.tensor(w_t)
    with torch.no_grad():
        y_t = conv_t(F.pad(torch.tensor(x), (1, 1, 1, 1))).numpy()

    conv_j = TorchConv(cout, kernel_size=3, stride=2, padding=1,
                       use_bias=False)
    # torch OIHW -> our HWIO
    kernel = jnp.asarray(np.transpose(w_t, (2, 3, 1, 0)))
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    y_j = conv_j.apply({'params': {'kernel': kernel}}, x_nhwc)
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch():
    import jax.numpy as jnp
    from pcdet_tpu.models.layers import TorchConvTranspose

    rng = np.random.RandomState(2)
    cin, cout, h, w, s = 6, 10, 9, 11, 2
    x = rng.randn(2, cin, h, w).astype(np.float32)
    deconv_t = nn.ConvTranspose2d(cin, cout, s, stride=s, bias=False)
    w_t = rng.randn(cin, cout, s, s).astype(np.float32) * 0.1
    deconv_t.weight.data = torch.tensor(w_t)
    with torch.no_grad():
        y_t = deconv_t(torch.tensor(x)).numpy()

    deconv_j = TorchConvTranspose(cout, stride=s, use_bias=False)
    # torch IOHW -> HWIO
    kernel = jnp.asarray(np.transpose(w_t, (2, 3, 0, 1)))
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    y_j = deconv_j.apply({'params': {'kernel': kernel}}, x_nhwc)
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)


def test_focal_and_smooth_l1_losses_match_reference_formulas():
    import jax.numpy as jnp
    from pcdet_tpu.utils import loss as L

    rng = np.random.RandomState(3)
    logits = rng.randn(2, 32, 3).astype(np.float32)
    targets = (rng.rand(2, 32, 3) > 0.7).astype(np.float32)
    weights = rng.rand(2, 32).astype(np.float32)

    # reference focal loss in torch (loss_utils.py:56-125)
    lt = torch.tensor(logits)
    tt = torch.tensor(targets)
    ce = torch.clamp(lt, min=0) - lt * tt + torch.log1p(torch.exp(-torch.abs(lt)))
    p = torch.sigmoid(lt)
    p_t = tt * p + (1 - tt) * (1 - p)
    mod = (1 - p_t) ** 2.0
    alpha_w = tt * 0.25 + (1 - tt) * 0.75
    want = (mod * alpha_w * ce * torch.tensor(weights).unsqueeze(-1)).numpy()
    got = np.asarray(L.sigmoid_focal_loss(jnp.asarray(logits),
                                          jnp.asarray(targets),
                                          jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # reference smooth-L1 with sigma=3 and code weights
    preds = rng.randn(2, 32, 7).astype(np.float32)
    tgts = rng.randn(2, 32, 7).astype(np.float32)
    cw = np.linspace(0.5, 1.5, 7).astype(np.float32)
    diff = torch.tensor((preds - tgts) * cw)
    abs_diff = torch.abs(diff)
    lt1 = (abs_diff <= 1 / 9.0).float()
    want = (lt1 * 0.5 * (abs_diff * 3.0) ** 2
            + (abs_diff - 0.5 / 9.0) * (1 - lt1))
    want = (want * torch.tensor(weights).unsqueeze(-1)).numpy()
    got = np.asarray(L.weighted_smooth_l1(jnp.asarray(preds), jnp.asarray(tgts),
                                          weights=jnp.asarray(weights),
                                          sigma=3.0, code_weights=cw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pfn_layer_matches_torch():
    """PFN: Linear(no bias) -> BN1d over flattened points -> ReLU -> max
    (reference vfe_utils.py:60-116), with padding-voxel masking."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.vfe import PFNLayer

    rng = np.random.RandomState(4)
    n_vox, n_pts, cin, cout = 20, 8, 10, 16
    x = rng.randn(1, n_vox, n_pts, cin).astype(np.float32)
    mask = np.ones((1, n_vox), bool)    # all voxels real -> same as reference

    linear_t = nn.Linear(cin, cout, bias=False)
    w_t = rng.randn(cout, cin).astype(np.float32) * 0.2
    linear_t.weight.data = torch.tensor(w_t)
    bn_t = nn.BatchNorm1d(cout, eps=1e-3, momentum=0.01)

    with torch.no_grad():
        h = linear_t(torch.tensor(x[0]))
        h = bn_t(h.view(-1, cout)).view(n_vox, n_pts, cout)
        h = torch.relu(h)
        want = torch.max(h, dim=1)[0].numpy()

    layer = PFNLayer(cout, use_norm=True, last_layer=True)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(mask), train=True)
    params = {'TorchLinear_0': {'kernel': jnp.asarray(w_t.T)},
              'TorchBatchNorm_0': variables['params']['TorchBatchNorm_0']}
    got, _ = layer.apply(
        {'params': params, 'batch_stats': variables['batch_stats']},
        jnp.asarray(x), jnp.asarray(mask), True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4, atol=1e-4)


def test_grouped_batchnorm_matches_per_device_torch_bn():
    """BN_GROUPS=g must equal torch BN run independently on each batch group
    (per-GPU DDP semantics, reference tools/train.py:94-95), with running
    stats tracking group 0 (DDP rank 0's buffers are what gets checkpointed)."""
    import torch
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models import layers

    rng = np.random.RandomState(3)
    x = rng.randn(6, 7, 5).astype(np.float32)

    bn = layers.TorchBatchNorm(5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    layers.set_bn_groups(2)
    try:
        y, updated = bn.apply(variables, jnp.asarray(x), True,
                              mutable=['batch_stats'])
    finally:
        layers.set_bn_groups(1)

    tbn = torch.nn.BatchNorm1d(5, eps=1e-3, momentum=0.01)
    with torch.no_grad():
        ys = []
        for g in range(2):
            if g == 1:        # rank-0 buffers only: reset after group 0
                saved = (tbn.running_mean.clone(), tbn.running_var.clone())
            xt = torch.from_numpy(x[g * 3:(g + 1) * 3]).reshape(-1, 5)
            ys.append(tbn(xt).reshape(3, 7, 5).numpy())
    np.testing.assert_allclose(np.asarray(y), np.concatenate(ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updated['batch_stats']['mean']), saved[0].numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updated['batch_stats']['var']), saved[1].numpy(),
        rtol=1e-5, atol=1e-6)


def test_pfn_eval_max_commute_bit_identical():
    """Eval PFN restructure (max commuted past the monotone BN affine + ReLU,
    vfe.py PFNLayer): bit-identical to the stock relu(bn(h)).max(points) path,
    including negative BN scales (which flip the extremum to min_p h)."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.vfe import PFNLayer

    rng = np.random.RandomState(11)
    n_vox, n_pts, cin, cout = 24, 8, 10, 16
    x = rng.randn(2, n_vox, n_pts, cin).astype(np.float32)
    x[0, :, 5:] = 0.0                                # padded point slots
    mask = np.ones((2, n_vox), bool)
    mask[1, 17:] = False

    layer = PFNLayer(cout, use_norm=True, last_layer=True)
    variables = layer.init(jax.random.PRNGKey(3), jnp.asarray(x),
                           jnp.asarray(mask), train=True)
    # non-trivial running stats + NEGATIVE scales on half the channels
    scale = rng.randn(cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    bmean = rng.randn(cout).astype(np.float32) * 0.3
    bvar = (rng.rand(cout).astype(np.float32) + 0.5)
    params = {'TorchLinear_0': variables['params']['TorchLinear_0'],
              'TorchBatchNorm_0': {'scale': jnp.asarray(scale),
                                   'bias': jnp.asarray(bias)}}
    stats = {'TorchBatchNorm_0': {'mean': jnp.asarray(bmean),
                                  'var': jnp.asarray(bvar)}}
    got = layer.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x), jnp.asarray(mask), False)

    # stock composition with the exact same float ops
    w = np.asarray(params['TorchLinear_0']['kernel'])
    h = jnp.asarray(x) @ jnp.asarray(w)
    hn = (h - jnp.asarray(bmean)) * jax.lax.rsqrt(jnp.asarray(bvar) + 1e-3)
    want = jnp.max(jax.nn.relu(hn * scale + bias), axis=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pfn_eval_no_norm_commute_bit_identical():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.vfe import PFNLayer

    rng = np.random.RandomState(12)
    x = rng.randn(1, 16, 6, 9).astype(np.float32)
    mask = np.ones((1, 16), bool)
    layer = PFNLayer(8, use_norm=False, last_layer=True)
    variables = layer.init(jax.random.PRNGKey(5), jnp.asarray(x),
                           jnp.asarray(mask), train=True)
    got = layer.apply(variables, jnp.asarray(x), jnp.asarray(mask), False)
    k = variables['params']['TorchLinear_0']['kernel']
    b = variables['params']['TorchLinear_0']['bias']
    want = jnp.max(jax.nn.relu(jnp.asarray(x) @ k + b), axis=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
