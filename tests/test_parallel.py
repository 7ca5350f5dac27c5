"""Mesh + sharding rule tests on the 8-virtual-device CPU mesh, plus the
driver entry points in __graft_entry__.py."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from transformer_latent_diffusion_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    param_shardings,
)


def test_create_mesh_default_all_data():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape[MODEL_AXIS] == 1


def test_create_mesh_dp_tp():
    mesh = create_mesh((2, 4))
    assert mesh.shape[DATA_AXIS] == 2
    assert mesh.shape[MODEL_AXIS] == 4


def test_param_sharding_rules():
    mesh = create_mesh((2, 4))
    params = {
        "decoder_block_0": {
            "self_attention": {"qkv_linear": {"kernel": jnp.zeros((128, 384))}},
            "mlp": {
                "expand": {"kernel": jnp.zeros((128, 512))},
                "contract": {"kernel": jnp.zeros((512, 128))},
            },
            "norm1": {"scale": jnp.zeros((128,))},
        },
        "pos_embed": jnp.zeros((64, 128)),
    }
    sh = param_shardings(params, mesh)
    blk = sh["decoder_block_0"]
    assert blk["self_attention"]["qkv_linear"]["kernel"].spec == P(None, MODEL_AXIS)
    assert blk["mlp"]["expand"]["kernel"].spec == P(None, MODEL_AXIS)
    assert blk["mlp"]["contract"]["kernel"].spec == P(MODEL_AXIS, None)
    assert blk["norm1"]["scale"].spec == P()
    assert sh["pos_embed"].spec == P()


def test_param_sharding_skips_indivisible():
    mesh = create_mesh((2, 4))
    params = {"expand": {"kernel": jnp.zeros((16, 30))}}  # 30 % 4 != 0
    sh = param_shardings(params, mesh)
    assert sh["expand"]["kernel"].spec == P()


def test_fsdp_param_shardings():
    """fsdp=True shards each leaf's largest free axis over 'data'
    (ZeRO-3); composes with the TP rules; indivisible axes replicate."""
    mesh = create_mesh((8, 1))
    params = {
        "expand": {"kernel": jnp.zeros((128, 512))},
        "norm": {"scale": jnp.zeros((128,))},
        "odd": jnp.zeros((30,)),  # 30 % 8 != 0 -> replicated
    }
    sh = param_shardings(params, mesh, fsdp=True)
    assert sh["expand"]["kernel"].spec == P(None, DATA_AXIS)
    assert sh["norm"]["scale"].spec == P(DATA_AXIS)
    assert sh["odd"].spec == P()

    # composes with TP: the model-sharded axis stays, fsdp takes the
    # largest remaining free axis
    mesh_tp = create_mesh((2, 4))
    tp_params = {"qkv_linear": {"kernel": jnp.zeros((128, 384))}}
    sh_tp = param_shardings(tp_params, mesh_tp, fsdp=True)
    assert sh_tp["qkv_linear"]["kernel"].spec == P(DATA_AXIS, MODEL_AXIS)

    # fsdp off: unchanged behaviour
    sh_off = param_shardings(params, mesh)
    assert sh_off["expand"]["kernel"].spec == P()


def test_batch_sharding_places_batch_on_data_axis():
    mesh = create_mesh((8, 1))
    x = jax.device_put(np.ones((16, 3)), batch_sharding(mesh))
    assert x.sharding.spec == P(DATA_AXIS)
    assert len(x.addressable_shards) == 8


def test_graft_entry_and_dryrun():
    spec = importlib.util.spec_from_file_location("graft_entry",
                                                  "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 4, 32, 32)

    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)


def test_fused_kernels_gated_off_under_tensor_parallelism():
    """Pallas calls are not GSPMD-partitionable: with a model axis > 1
    the fused train kernels must be forced OFF even when explicitly
    requested, and the TP train step must build + run without them."""
    from dataclasses import asdict

    import optax

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import (
        _build_train_step,
        resolve_fused_flags,
    )
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    forced_on = TrainConfig(mesh_shape=(2, 4), fused_layer_vjp=True,
                            fused_mlp_vjp=True, fused_attn_vjp=True,
                            batch_size=4)
    # the gate must override explicit True on any backend
    for on_tpu in (False, True):
        assert resolve_fused_flags(forced_on, on_tpu) == (False, False, False)
    # no TP: explicit flags pass through
    solo = TrainConfig(mesh_shape=(8, 1), fused_layer_vjp=True)
    assert resolve_fused_flags(solo, True)[0] is True
    assert resolve_fused_flags(TrainConfig(), True) == (True, False, False)

    # build + run one real TP=4 train step with the gated flags
    mesh = create_mesh((2, 4))
    cfg = DenoiserConfig(image_size=16, embed_dim=256, n_layers=2,
                         noise_embed_dims=64)
    fl, fm, fa = resolve_fused_flags(forced_on, True)
    model = Denoiser(**asdict(cfg), fused_layer_vjp=fl, fused_mlp_vjp=fm,
                     fused_attn_vjp=fa)
    params = init_denoiser_params(model, cfg)
    optimizer = optax.adam(1e-4)
    from transformer_latent_diffusion_tpu.parallel import replicated

    p_shard = param_shardings(params, mesh)
    params = jax.device_put(params, p_shard)
    state = {
        "params": params,
        "ema_params": jax.device_put(jax.tree.map(jnp.copy, params), p_shard),
        "opt_state": jax.tree.map(
            lambda l: jax.device_put(l, replicated(mesh)),
            optimizer.init(params)),
        "step": jnp.asarray(0),
    }
    step = jax.jit(_build_train_step(model, optimizer, forced_on, 8.0))
    x = jax.device_put(np.ones((4, 4, 16, 16), np.float32),
                       batch_sharding(mesh))
    y = jax.device_put(np.ones((4, cfg.text_emb_size), np.float32),
                       batch_sharding(mesh))
    state, loss = step(state, x, y, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("kernel_kw", [
    {"fused_mlp_vjp": True},
    # fused_layer_vjp is the DEFAULT-ON kernel under shard_map-DP on TPU
    # (train.py resolve_fused_flags) — a different custom-VJP primitive,
    # so it gets its own exactness run (VERDICT r2 #4)
    {"fused_layer_vjp": True},
])
def test_dp_shard_map_grads_match_manual_average(kernel_kw):
    """The shard_map DP train path (how fused Pallas kernels compose
    with multi-chip data parallelism) must produce exactly the
    psum-average of per-shard gradients, each computed with
    fold_in(rng, shard_index) — verified against a single-device
    per-shard reference, with the fused kernel under test forced ON
    (interpret-mode Pallas on CPU)."""
    from dataclasses import asdict

    import optax

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        TrainConfig,
    )
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.train.train import _build_train_step
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    dp = 8
    mesh = create_mesh((dp, 1))
    cfg = DenoiserConfig(image_size=8, embed_dim=64, n_layers=1,
                         noise_embed_dims=64)
    train_cfg = TrainConfig(batch_size=2 * dp, compute_dtype="float32")
    model = Denoiser(**asdict(cfg), **kernel_kw)
    params = init_denoiser_params(model, cfg)
    optimizer = optax.sgd(1.0)  # updates == -grads: grads visible exactly

    step_sm = jax.jit(_build_train_step(
        model, optimizer, train_cfg, 8.0, mesh=mesh, dp_shard_map=True))

    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.standard_normal((2 * dp, 4, 8, 8)), jnp.float32)
    y = jnp.asarray(rng_np.standard_normal((2 * dp, 768)), jnp.float32)
    key = jax.random.PRNGKey(7)

    state = {
        "params": params,
        "ema_params": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0),
    }
    new_state, loss = step_sm(
        {k: jax.tree.map(jnp.copy, v) if k != "step" else v
         for k, v in state.items()}, x, y, key)

    # reference: per-shard grads on one device, manually averaged
    from transformer_latent_diffusion_tpu.train.train import (
        _build_train_step as _bts,
    )
    # reuse the internal loss function via a 1-device step with sgd(1):
    # params_new = params - grad  =>  grad = params - params_new
    losses, grad_trees = [], []
    for i in range(dp):
        shard_state = {
            "params": jax.tree.map(jnp.copy, params),
            "ema_params": jax.tree.map(jnp.copy, params),
            "opt_state": optimizer.init(params),
            "step": jnp.asarray(0),
        }
        step_1 = jax.jit(_bts(model, optimizer, train_cfg, 8.0))
        ns, li = step_1(shard_state, x[2 * i: 2 * i + 2],
                        y[2 * i: 2 * i + 2], jax.random.fold_in(key, i))
        losses.append(float(li))
        grad_trees.append(jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            params, ns["params"]))
    want_loss = np.mean(losses)
    np.testing.assert_allclose(float(loss), want_loss, atol=1e-5, rtol=1e-5)
    got_grads = jax.tree.map(
        lambda a, b: np.asarray(a) - np.asarray(b),
        params, new_state["params"])
    want_grads = jax.tree.map(
        lambda *gs: np.mean(np.stack(gs), axis=0), *grad_trees)
    for kp, g in jax.tree_util.tree_leaves_with_path(got_grads):
        node = want_grads
        for k in kp:
            node = node[k.key]
        np.testing.assert_allclose(g, node, atol=2e-5, rtol=2e-4,
                                   err_msg=str(kp))


def test_sharded_generation_matches_single_device():
    """generate() with a mesh shards the sampling scan batch-DP over the
    'data' axis (GSPMD) and must match the unsharded XLA path."""
    from dataclasses import asdict

    from transformer_latent_diffusion_tpu.configs import DenoiserConfig
    from transformer_latent_diffusion_tpu.models import Denoiser
    from transformer_latent_diffusion_tpu.sampling import DiffusionGenerator
    from transformer_latent_diffusion_tpu.utils import init_denoiser_params

    cfg = DenoiserConfig()
    model = Denoiser(**asdict(cfg))
    params = init_denoiser_params(model, cfg)
    labels = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, cfg.text_emb_size)),
        dtype=jnp.float32)
    kw = dict(labels=labels, num_imgs=8, img_size=cfg.image_size, n_iter=4,
              seed=5, sharp_f=0, bright_f=0, use_ddpm_plus=False)

    gen = DiffusionGenerator(model=model, params=params, vae=None)
    _, want = gen.generate(**kw)

    mesh = create_mesh()  # all 8 virtual devices on 'data'
    gen_sharded = DiffusionGenerator(model=model, params=params, vae=None,
                                     mesh=mesh)
    _, got = gen_sharded.generate(**kw)
    assert len(got.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    # DP x TP generation: params sharded by the Megatron TP rules over
    # the model axis, batch over data; XLA inserts the all-reduces
    mesh_tp = create_mesh((2, 4))
    gen_tp = DiffusionGenerator(model=model, params=params, vae=None,
                                mesh=mesh_tp)
    _, got_tp = gen_tp.generate(**kw)
    np.testing.assert_allclose(np.asarray(got_tp), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    # sequence-parallel generation: self-attention token dim sharded
    # over 'model' (parallel/sequence.py) inside the sampling scan
    sp_model = Denoiser(**asdict(cfg), seq_mesh=mesh_tp)
    gen_sp = DiffusionGenerator(model=sp_model, params=params, vae=None,
                                mesh=mesh_tp)
    _, got_sp = gen_sp.generate(**kw)
    np.testing.assert_allclose(np.asarray(got_sp), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_sequence_parallel_generation():
    """LTDConfig(mesh_shape, sequence_parallel=True) routes the public
    text-to-image API through sequence-parallel sampling; pixels match
    the single-device pipeline within float-scheduling tolerance."""
    from transformer_latent_diffusion_tpu.configs import (
        ClipConfig,
        DenoiserConfig,
        LTDConfig,
        VaeConfig,
    )
    from transformer_latent_diffusion_tpu.sampling.pipeline import (
        DiffusionTransformer,
    )

    def cfg(**kw):
        return LTDConfig(
            denoiser_cfg=DenoiserConfig(),
            vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
            clip_cfg=ClipConfig(width=64, heads=2, layers=2),
            use_pallas=False, **kw)

    want = DiffusionTransformer(cfg()).generate_image_from_text(
        "a cute cat", num_imgs=4, seed=7, n_iter=4)
    got = DiffusionTransformer(
        cfg(mesh_shape=(2, 4), sequence_parallel=True),
    ).generate_image_from_text("a cute cat", num_imgs=4, seed=7, n_iter=4)
    a, b = np.asarray(want).astype(int), np.asarray(got).astype(int)
    assert np.abs(a - b).max() <= 1
