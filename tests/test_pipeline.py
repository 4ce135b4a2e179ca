"""Pipeline parallelism (parallel/pipeline.py): 2-stage GPipe executor.

Parity contract: the pipelined schedule must equal the SEQUENTIAL
per-microbatch loop (state threaded in microbatch order) exactly — same
forward outputs, same BatchNorm state evolution, same gradients. That
loop is also the semantics of the grad-accum path (train/step.py), so PP
composes with the rest of the training stack. Runs on the suite's
8-device virtual CPU mesh (conftest).
"""
import jax
import jax.numpy as jnp
import pytest

from maskunet_tpu.models import maskattn_unet as mu
from maskunet_tpu.parallel import pipeline as pp

M, MB, IMG, COUT = 3, 2, 16, 5


@pytest.fixture(scope="module")
def setup():
    cfg = mu.MaskAttnUNetConfig(c_out=COUT, img_size=IMG, dropout_rate=0.0,
                                attn_impl="dense")
    params, state = mu.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (M * MB, IMG, IMG, 3))
    masks = mu.make_attention_masks(jax.random.key(2), MB, IMG)
    mesh = pp.make_pipe_mesh()
    xm = pp.split_microbatches(x, M)
    return cfg, params, state, masks, mesh, xm


def _sequential(params, state, xm, cfg, masks, train):
    st = state
    outs = []
    for i in range(M):
        o, st = mu.apply(params, st, xm[i], cfg=cfg, masks=masks,
                         train=train)
        outs.append(o.semantic)
    return jnp.stack(outs), st


def test_pipeline_eval_forward_matches_sequential(setup):
    cfg, params, state, masks, mesh, xm = setup
    out, _ = pp.pipeline_apply(params, state, xm, cfg=cfg, mesh=mesh,
                               masks=masks, train=False)
    ref, _ = _sequential(params, state, xm, cfg, masks, train=False)
    assert float(jnp.max(jnp.abs(out.semantic - ref))) < 1e-5


def test_pipeline_train_forward_and_state_match_sequential(setup):
    cfg, params, state, masks, mesh, xm = setup
    out, st_pp = pp.pipeline_apply(params, state, xm, cfg=cfg, mesh=mesh,
                                   masks=masks, train=True)
    ref, st_ref = _sequential(params, state, xm, cfg, masks, train=True)
    # train mode recomputes BN batch stats; scan/cond fusion reorders the
    # f32 reductions vs the straight-line reference (observed ~2e-5)
    assert float(jnp.max(jnp.abs(out.semantic - ref))) < 1e-4
    for a, b in zip(jax.tree.leaves(st_pp), jax.tree.leaves(st_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_pipeline_gradients_match_sequential(setup):
    cfg, params, state, masks, mesh, xm = setup

    def loss_pp(p):
        o, _ = pp.pipeline_apply(p, state, xm, cfg=cfg, mesh=mesh,
                                 masks=masks, train=True)
        return jnp.mean(o.semantic ** 2)

    def loss_ref(p):
        st = state
        tot = 0.0
        for i in range(M):
            o, st = mu.apply(p, st, xm[i], cfg=cfg, masks=masks, train=True)
            tot = tot + jnp.mean(o.semantic ** 2)
        return tot / M

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_ref))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * max(scale, 1.0)


def test_pipeline_dropout_and_heads_run(setup):
    """Dropout rng threading + 3-head variant through the pipeline."""
    cfg = mu.MaskAttnUNetConfig(c_out=COUT, img_size=IMG, dropout_rate=0.3,
                                embed_dim=4, with_boundary_head=True,
                                attn_impl="dense")
    params, state = mu.init(jax.random.key(3), cfg)
    masks, mesh, xm = setup[3], setup[4], setup[5]
    out, st = pp.pipeline_apply(params, state, xm, cfg=cfg, mesh=mesh,
                                masks=masks, train=True,
                                dropout_rng=jax.random.key(4))
    for leaf in (out.semantic, out.boundary, out.embeddings,
                 *jax.tree.leaves(st)):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_pipeline_rejects_bad_mesh_and_batch(setup):
    cfg, params, state, masks, mesh, xm = setup
    with pytest.raises(ValueError, match="not divisible"):
        pp.split_microbatches(jnp.zeros((5, 4)), 2)
    from jax.sharding import Mesh
    import numpy as np
    bad = Mesh(np.asarray(jax.devices()[:4]).reshape(4,), ("pipe",))
    with pytest.raises(ValueError, match="size 2"):
        pp.pipeline_apply(params, state, xm, cfg=cfg, mesh=bad, masks=masks)


# ---------------------------------------------------------------------------
# dp x pp composition (VERDICT r4 #1): 'data' stays a GSPMD auto axis
# ---------------------------------------------------------------------------


def _dp_pipe_mesh():
    return pp.make_dp_pipe_mesh(n_data=4, devices=jax.devices()[:8])


def test_dp_pipe_mesh_construction_and_validation():
    import numpy as np
    from jax.sharding import Mesh

    mesh = _dp_pipe_mesh()
    assert dict(mesh.shape) == {"data": 4, "pipe": 2}
    with pytest.raises(ValueError, match="!= 8 devices"):
        pp.make_dp_pipe_mesh(n_data=3, devices=jax.devices()[:8])
    dp_only = Mesh(np.asarray(jax.devices()[:4]).reshape(4,), ("data",))
    with pytest.raises(ValueError, match="pipe"):
        pp.validate_pipe_mesh(dp_only)


def test_pipeline_dp_forward_and_grads_match_sequential(setup):
    """On a ('data', 'pipe') mesh with the microbatch dim sharded over
    `data`, the executor must still equal the sequential per-microbatch
    loop — forward outputs AND parameter gradients (whose cross-replica
    all-reduce over `data` GSPMD inserts outside the shard_map)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params, state, _, _, _ = setup
    mesh = _dp_pipe_mesh()
    # microbatch size 4: one example per 'data' replica
    mb_dp = 4
    x = jax.random.normal(jax.random.key(7), (M * mb_dp, IMG, IMG, 3))
    masks = mu.make_attention_masks(jax.random.key(8), mb_dp, IMG)
    xm = pp.split_microbatches(x, M)
    xs = jax.device_put(xm, NamedSharding(mesh, P(None, "data")))

    out, _ = pp.pipeline_apply(params, state, xs, cfg=cfg, mesh=mesh,
                               masks=masks, train=False)
    ref, _ = _sequential(params, state, xm, cfg, masks, train=False)
    assert float(jnp.max(jnp.abs(out.semantic - ref))) < 1e-5

    def loss_pp(p):
        o, _ = pp.pipeline_apply(p, state, xs, cfg=cfg, mesh=mesh,
                                 masks=masks, train=True)
        return jnp.mean(o.semantic ** 2)

    def loss_ref(p):
        st = state
        tot = 0.0
        for i in range(M):
            o, st = mu.apply(p, st, xm[i], cfg=cfg, masks=masks, train=True)
            tot = tot + jnp.mean(o.semantic ** 2)
        return tot / M

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_ref))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * max(scale, 1.0)


def test_train_loop_dp_pipeline_smoke(tmp_path):
    """The CLI's --pipeline 2 --n-data 4 path: loop.train on a
    ('data', 'pipe') mesh — batch sharded over data through the prefetcher,
    state replicated over the full mesh, pipelined step, checkpoints."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(
        recipes_lib.get("synthetic_semantic"), img_size=16,
        checkpoint_name="dp_pp_smoke")
    res = loop.train(rec, None, str(tmp_path), max_steps=2, max_epochs=1,
                     log_every=0, verbose=False, pipeline_microbatches=2,
                     mesh=_dp_pipe_mesh())
    assert res.history, "no epochs recorded"
    import math
    assert math.isfinite(res.history[0]["loss"])
    assert (tmp_path / "dp_pp_smoke_latest.msgpack").exists() or \
           (tmp_path / "dp_pp_smoke_best.msgpack").exists()


# ---------------------------------------------------------------------------
# Training-stack integration (train/step.py pipe_mesh + loop --pipeline)
# ---------------------------------------------------------------------------


def test_pipeline_train_step_matches_sequential_update(setup):
    """make_train_step(pipe_mesh=...) must produce exactly the update of
    the equivalent sequential computation: per-microbatch forwards with
    BN state threaded in order, ONE global CE over all outputs, one AdamW
    step."""
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.losses.cross_entropy import cross_entropy
    from maskunet_tpu.train import step as step_lib

    cfg, params, state, masks, mesh, xm = setup
    labels = jax.random.randint(jax.random.key(5), (M * MB, IMG, IMG),
                                0, COUT)
    batch = {"image": xm.reshape((M * MB, IMG, IMG, 3)), "label": labels}

    # SGD, not AdamW: the first AdamW step from zero moments is exactly
    # lr*sign(grad) elementwise, so a near-zero grad element whose sign
    # flips under f32 reduction reordering moves the param by 2*lr — a
    # sign comparison, not a numerics one. SGD's update is linear in the
    # grad, so the comparison inherits the grad tolerance.
    tx = optax.sgd(0.1)
    ts = state_lib.create(jax.random.key(6), params, state, tx, masks=masks)
    step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx, pipe_mesh=mesh, pipe_microbatches=M))
    ts2, metrics = step(ts, batch)

    def loss_ref(p):
        st = state
        outs = []
        for i in range(M):
            o, st = mu.apply(p, st, xm[i], cfg=cfg, masks=masks, train=True)
            outs.append(o.semantic)
        logits = jnp.concatenate(outs).astype(jnp.float32)
        return cross_entropy(logits, labels, None), st

    (loss_ref_val, st_ref), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_ref, has_aux=True)(p))(ts.params)
    updates, _ = tx.update(grads, ts.opt_state, ts.params)
    params_ref = jax.tree.map(lambda a, b: a + b, ts.params, updates)

    assert abs(float(metrics["loss"]) - float(loss_ref_val)) < 1e-5
    for a, b in zip(jax.tree.leaves(ts2.params), jax.tree.leaves(params_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5
    for a, b in zip(jax.tree.leaves(ts2.model_state),
                    jax.tree.leaves(st_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4
    assert int(ts2.step) == 1


def test_pipeline_step_rejects_bad_combinations(setup):
    import optax

    from maskunet_tpu.train import step as step_lib

    cfg, _, _, _, mesh, _ = setup
    tx = optax.adamw(1e-3)
    with pytest.raises(ValueError, match=">= 2"):
        step_lib.make_train_step(cfg, step_lib.TaskConfig(), tx,
                                 pipe_mesh=mesh, pipe_microbatches=1)


def test_pipeline_grad_accum_matches_sequential_update(setup):
    """grad_accum composes with pipeline parallelism as an OUTER loop:
    grad_accum GPipe flushes per optimizer step, gradients averaged over
    flushes. Must equal the sequential reference: per-flush global CE
    (BN state threaded through flushes in order), grads at the same
    initial params, averaged, one SGD update."""
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.losses.cross_entropy import cross_entropy
    from maskunet_tpu.train import step as step_lib

    GA = 2
    cfg, params, state, masks, mesh, _ = setup
    x = jax.random.normal(jax.random.key(7), (GA * M * MB, IMG, IMG, 3))
    labels = jax.random.randint(jax.random.key(8), (GA * M * MB, IMG, IMG),
                                0, COUT)
    batch = {"image": x, "label": labels}

    tx = optax.sgd(0.1)   # linear in the grad; see the test above
    ts = state_lib.create(jax.random.key(9), params, state, tx, masks=masks)
    step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx, pipe_mesh=mesh,
        pipe_microbatches=M, grad_accum=GA))
    ts2, metrics = step(ts, batch)

    chunks = x.reshape((GA, M * MB, IMG, IMG, 3))
    lab_chunks = labels.reshape((GA, M * MB, IMG, IMG))

    def chunk_loss(p, st, g):
        xm = pp.split_microbatches(chunks[g], M)
        outs = []
        for i in range(M):
            o, st = mu.apply(p, st, xm[i], cfg=cfg, masks=masks,
                             train=True)
            outs.append(o.semantic)
        logits = jnp.concatenate(outs).astype(jnp.float32)
        return cross_entropy(logits, lab_chunks[g], None), st

    @jax.jit
    def reference(p):
        st = state
        gsum = jax.tree.map(jnp.zeros_like, p)
        losses = []
        for g in range(GA):
            (l, st), grads = jax.value_and_grad(
                chunk_loss, has_aux=True)(p, st, g)
            gsum = jax.tree.map(lambda a, b: a + b, gsum, grads)
            losses.append(l)
        gavg = jax.tree.map(lambda a: a / GA, gsum)
        updates, _ = tx.update(gavg, ts.opt_state, p)
        return (jax.tree.map(lambda a, b: a + b, p, updates), st,
                jnp.mean(jnp.stack(losses)))

    params_ref, st_ref, loss_ref = reference(ts.params)
    assert abs(float(metrics["loss"]) - float(loss_ref)) < 1e-5
    for a, b in zip(jax.tree.leaves(ts2.params),
                    jax.tree.leaves(params_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5
    for a, b in zip(jax.tree.leaves(ts2.model_state),
                    jax.tree.leaves(st_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4
    assert int(ts2.step) == 1


def test_train_loop_pipeline_smoke(tmp_path):
    """`loop.train(pipeline_microbatches=2)` (the CLI's --pipeline 2):
    mesh construction, microbatch batching, metrics, and checkpointing
    all through the pipelined step."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(
        recipes_lib.get("synthetic_semantic"), img_size=16,
        checkpoint_name="pp_smoke")
    res = loop.train(rec, None, str(tmp_path), max_steps=2, max_epochs=1,
                     log_every=0, verbose=False, pipeline_microbatches=2)
    assert res.history, "no epochs recorded"
    assert res.history[0]["loss"] == pytest.approx(res.history[0]["loss"])
    assert (tmp_path / "pp_smoke_latest.msgpack").exists() or \
           (tmp_path / "pp_smoke_best.msgpack").exists()
