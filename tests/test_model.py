import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.models import GraphEncoder, PeakEmbed, SimCLRModel, build_model
from grafp_tpu.models.gnn import MRConv, dilation_for_block
from grafp_tpu.ops.knn import knn_graph


def _init(mod, *args, **kwargs):
    return mod.init({"params": jax.random.key(0)}, *args, **kwargs)


# --------------- PeakEmbed ---------------

def test_peak_embed_shapes_and_coords(rng):
    spec = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    pe = PeakEmbed()
    vars_ = _init(pe, spec)
    out = pe.apply(vars_, spec)
    assert out.shape == (2, 1024, 8)  # N = 64*32/2 (reference graph_encoder.py:124)
    # min-max normalized input must be scale-invariant up to coords
    out2 = pe.apply(vars_, spec * 5 + 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


# --------------- MRConv vs independent numpy spec ---------------

def test_mrconv_matches_numpy_spec(rng):
    B, N, C, k = 2, 12, 8, 3
    x = rng.randn(B, N, C).astype(np.float32)
    idx = rng.randint(0, N, size=(B, N, k))
    # numpy re-derivation of the reference semantics (torch_vertex.py:19-34):
    # x_j = gather(x, idx); rel = max_k(x_j - x_i); interleave [x, rel];
    # grouped 1x1 conv (groups=4) + BN(eval: running stats mu=0 var=1) + relu
    xj = np.stack([[x[b, idx[b, n]] for n in range(N)] for b in range(B)])
    rel = (xj - x[:, :, None, :]).max(axis=2)

    m = MRConv(out_features=2 * C)
    vars_ = m.init(jax.random.key(1), jnp.asarray(x), jnp.asarray(rel), False)
    got = np.asarray(m.apply(vars_, jnp.asarray(x), jnp.asarray(rel), False))

    inter = np.stack([x, rel], axis=-1).reshape(B, N, 2 * C)
    W = np.asarray(vars_["params"]["GroupedPointwiseConv_0"]["kernel"])
    bias = np.asarray(vars_["params"]["GroupedPointwiseConv_0"]["bias"])
    g, cig, cog = W.shape
    xg = inter.reshape(B, N, g, cig)
    y = np.einsum("bngi,gio->bngo", xg, W).reshape(B, N, g * cog) + bias
    bn = vars_["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]
    scale = np.asarray(vars_["params"]["BatchNorm_0"]["BatchNorm_0"]["scale"])
    bias_bn = np.asarray(vars_["params"]["BatchNorm_0"]["BatchNorm_0"]["bias"])
    mu, var = np.asarray(bn["mean"]), np.asarray(bn["var"])
    y = (y - mu) / np.sqrt(var + 1e-5) * scale + bias_bn
    ref = np.maximum(y, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# --------------- GraphEncoder ---------------

def test_graph_encoder_forward_tiny(rng):
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))  # tiny N=64
    enc = GraphEncoder(size="t", k=3)
    vars_ = _init(enc, x, False)
    out = enc.apply(vars_, x, False)
    assert out.shape == (2, 1024)
    assert np.isfinite(np.asarray(out)).all()


def test_graph_encoder_param_count():
    """Analytic parity with the reference encoder (graph_encoder.py size
    't', in_channels=8): stem 640 + backbone 11,566,336 + downsamples
    1,550,976 + proj 525,312 = 13,643,264 torch-side trainable params;
    ours is that minus the provably-dead downsample kernel columns (the
    3x3 conv on a width-1 input only ever uses its center column;
    6*64*128 + 6*128*256 + 6*256*512 = 1,032,192 dead weights)."""
    x = jnp.zeros((1, 64, 8))
    enc = GraphEncoder(size="t", k=3)
    vars_ = _init(enc, x, False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vars_["params"]))
    assert n == 13_643_264 - 1_032_192


def test_dilation_schedules():
    assert [dilation_for_block(i, 3, "reference") for i in range(12)] == [1] * 12
    assert [dilation_for_block(i, 3, "ramp") for i in range(12)] == [
        1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    ]


def test_graph_encoder_train_mode_updates_stats(rng):
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    enc = GraphEncoder(size="t", k=3)
    vars_ = _init(enc, x, False)
    out, updates = enc.apply(
        vars_, x, True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 1024)
    stem_mean = updates["batch_stats"]["stem_bn"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(stem_mean), 0)


# --------------- SimCLR full model ---------------

def test_simclr_full_forward(rng):
    cfg = Config()
    model = build_model(cfg)
    spec = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    vars_ = model.init({"params": jax.random.key(0)}, spec, False)
    h, z = model.apply(vars_, spec, False)
    assert h.shape == (2, 1024)
    assert z.shape == (2, 128)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), np.ones(2), atol=1e-5
    )


def test_simclr_total_param_count():
    """Full-model analytic parity: the reference SimCLR(GraphEncoder)
    counts 18,367,264 trainable params (encoder 13,643,264 + peak
    extractor 1,184 + projector Linear(1024->4096)+Linear(4096->128) =
    4,722,816); ours is that minus the 1,032,192 dead downsample
    weights (see test_graph_encoder_param_count)."""
    cfg = Config()
    model = build_model(cfg)
    spec = jnp.zeros((1, 64, 32))
    vars_ = model.init({"params": jax.random.key(0)}, spec, False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vars_["params"]))
    assert n == 18_367_264 - 1_032_192


def test_graph_encoder_remat(rng):
    """remat=True must produce identical outputs (recompute-only)."""
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    enc = GraphEncoder(size="t", k=3)
    enc_r = GraphEncoder(size="t", k=3, remat=True)
    v = _init(enc, x, False)
    a = enc.apply(v, x, False)
    b = enc_r.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # and gradients flow under remat
    def loss(p):
        return jnp.sum(enc_r.apply({"params": p, "batch_stats": v["batch_stats"]}, x, False) ** 2)
    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


def test_grapher_pallas_strategy_matches_onehot(rng):
    """The production Grapher path (fused concat kernel + interleave
    absorbed into the conv weight permutation) must match the onehot
    strategy's forward AND parameter gradients with SHARED params."""
    import jax

    from grafp_tpu.models.gnn import Grapher

    x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    gp = Grapher(features=8, k=3, knn_strategy="pallas")
    go = Grapher(features=8, k=3, knn_strategy="onehot")
    v = go.init(jax.random.key(0), x, False)
    # identical param trees (the concat layout reuses the grouped params)
    vp = gp.init(jax.random.key(0), x, False)
    assert jax.tree.structure(vp) == jax.tree.structure(v)

    yp = np.asarray(gp.apply(v, x, False))
    yo = np.asarray(go.apply(v, x, False))
    np.testing.assert_allclose(yp, yo, rtol=1e-4, atol=1e-5)

    def loss(mod, params, xx):
        out = mod.apply(params, xx, True,
                        rngs={"droppath": jax.random.key(1)},
                        mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    gpx = jax.grad(lambda p: loss(gp, p, x))(v)
    gox = jax.grad(lambda p: loss(go, p, x))(v)
    flat_p = jax.tree.leaves(gpx)
    flat_o = jax.tree.leaves(gox)
    for a, b in zip(flat_p, flat_o):
        # bias grads are near-zero sums of cancelling terms: different
        # f32 accumulation orders leave ~1e-5 absolute noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_model_runs_on_cpu():
    """Portability regression: the shipped grafp.yaml sets
    compute_dtype=bfloat16, but XLA:CPU's DotThunk (jax 0.9.0) has no
    BF16xBF16=F32 kernel for the 'pair'-layout grouped einsum
    (GroupedPointwiseConv else-branch), which is exactly the branch CPU
    runs (knn_strategy auto -> onehot -> pair layout). A runtime
    UNIMPLEMENTED error here means the reference CLI contract breaks on
    any non-TPU host with the shipped config. layers.py upcasts that one
    einsum on the cpu backend; this locks train fwd+bwd in bf16."""
    cfg = Config(compute_dtype="bfloat16", n_mels=16, n_frames=8,
                 win_len=256, hop_len=128, n_fft=256, n_filters=8,
                 bsz_train=2)
    from grafp_tpu.train.state import create_train_state
    from grafp_tpu.train.step import make_train_step

    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, cfg, banks=None, donate=False)
    x = jax.random.normal(jax.random.key(1), (2, cfg.clip_frames),
                          jnp.float32)
    _, metrics = step(state, x, x + 0.01, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_dense_matmul_bf16grad_vjp():
    """Custom-VJP matmul (round-4 bwd attack): forward bit-identical to
    the plain f32-emitting einsum; f32 grads exactly equal (the
    cotangent cast is a no-op); bf16 grads equal the plain einsum's up
    to the documented cotangent quantization."""
    import jax
    import jax.numpy as jnp

    from grafp_tpu.models.layers import dense_matmul_bf16grad

    rng = np.random.RandomState(3)
    x32 = jnp.asarray(rng.randn(6, 5, 16).astype(np.float32))
    w32 = jnp.asarray(rng.randn(16, 8).astype(np.float32))

    def plain(x, w):
        return jnp.einsum("...i,io->...o", x, w,
                          preferred_element_type=jnp.float32)

    def loss_of(fn):
        return lambda x, w: jnp.sum(jnp.sin(fn(x, w)))

    # f32: bit-identical forward; grads equal up to contraction-order
    # rounding (the custom dw flattens batch dims before contracting)
    np.testing.assert_array_equal(
        np.asarray(dense_matmul_bf16grad(x32, w32)),
        np.asarray(plain(x32, w32)))
    g1 = jax.grad(loss_of(dense_matmul_bf16grad), argnums=(0, 1))(x32, w32)
    g2 = jax.grad(loss_of(plain), argnums=(0, 1))(x32, w32)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # bf16: forward identical, grads within quantization tolerance
    xb, wb = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(dense_matmul_bf16grad(xb, wb), np.float32),
        np.asarray(plain(xb, wb), np.float32))
    g1 = jax.grad(loss_of(dense_matmul_bf16grad), argnums=(0, 1))(xb, wb)
    g2 = jax.grad(loss_of(plain), argnums=(0, 1))(xb, wb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.02, atol=0.02)
