"""On-chip component profile of the flagship train step.

Times the full train step and its pieces at the REAL 4-cloud train
batch shapes with the relay-valid scheme (chained fori_loop, fresh
inputs, two loop lengths — see bench.py TIMING METHODOLOGY). Prints a
per-component table to drive optimization (VERDICT r2 item 5).

Usage:  python tools/profile_train.py            # full set
        python tools/profile_train.py step fwd   # subset
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(only=()):
    import jax
    import jax.numpy as jnp
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.models.semantic import SemanticTask
    from __graft_entry__ import _make_model

    # fresh-process A/B knobs (the relay's dispatch degrades after a
    # process's first device reads, so in-process A/B loops are
    # unreliable — compare FIRST measurements of separate processes)
    if os.environ.get('SPT_PROF_FUSE_RPE') == '0':
        from superpoint_transformer_tpu.nn.attention import (
            set_pallas_attention)
        set_pallas_attention(True, fuse_rpe_matmul=False)
        print('[knob] fuse_rpe_matmul=False')
    if os.environ.get('SPT_PROF_FLAT_OPT') == '0':
        import superpoint_transformer_tpu.models.semantic as _sem
        from superpoint_transformer_tpu.optim import lr_scheduler as _l
        _sem.make_optimizer = partial(_l.make_optimizer, flatten=False)
        print('[knob] optimizer flatten=False')

    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    cfg = BatchConfig()
    rng = np.random.default_rng(0)
    batch = prepare_batch([nag.clone() for _ in range(4)], cfg,
                          train=True, rng=rng, device=False)
    batch = jax.device_put(batch)

    task = SemanticTask(net=_make_model(num_graphs=4), num_classes=13,
                        total_steps=4000, warmup_steps=200)
    state = task.init_state(jax.random.PRNGKey(0), batch)

    def leaf_sum(tree):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def perturb(tree, c):
        return jax.tree_util.tree_map(
            lambda a: a + (c * 1e-12).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    N_SMALL, N_BIG = 4, 44

    def timeit(name, body_fn, carry0):
        """body_fn(i, carry) -> carry (scalar f32). Chained fori_loop,
        two lengths, overhead cancelled."""
        @partial(jax.jit, static_argnames='n')
        def loop(c0, n):
            return jax.lax.fori_loop(0, n, body_fn, c0)
        float(loop(carry0, N_SMALL))          # sacrificial
        float(loop(carry0, N_BIG))
        t0 = time.perf_counter()
        float(loop(carry0 + 1e-6, N_SMALL))
        d_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(carry0 + 2e-6, N_BIG))
        d_big = time.perf_counter() - t0
        ms = (d_big - d_small) / (N_BIG - N_SMALL) * 1e3
        print(f'{name:34s} {ms:8.3f} ms')
        return ms

    want = (lambda k: not only or k in only)

    # ---- full step ----------------------------------------------------
    if want('step'):
        def body(i, c):
            st2, m = task.train_step(
                state.replace(params=perturb(state.params, c)), batch,
                jax.random.fold_in(jax.random.PRNGKey(0), i))
            return leaf_sum(st2.params) * 1e-9 + m['loss'] * 0
        timeit('train_step (full)', body, jnp.float32(0.0))

    # NOTE: there is deliberately no in-process fuse_rpe_matmul A/B —
    # task.train_step is an already-traced jit whose cache keys on
    # function identity + avals, not the module-global knob, so the
    # second leg would silently re-run the first leg's program. A/B
    # via the env-gated fresh-process knobs above (SPT_PROF_FUSE_RPE,
    # SPT_PROF_FLAT_OPT) instead.

    if want('step8'):
        # batch-size lever: 8 clouds x 4 crops per step (32 crops ==
        # 2x the work per step; if time grows < 2x the step is
        # latency-bound and crops/sec improves)
        batch8 = prepare_batch([nag.clone() for _ in range(8)], cfg,
                               train=True,
                               rng=np.random.default_rng(1),
                               device=False)
        batch8 = jax.device_put(batch8)
        task8 = SemanticTask(net=_make_model(num_graphs=8),
                             num_classes=13, total_steps=2000,
                             warmup_steps=100)
        state8 = task8.init_state(jax.random.PRNGKey(0), batch8)

        def body(i, c):
            st2, m = task8.train_step(
                state8.replace(params=perturb(state8.params, c)),
                batch8, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return leaf_sum(st2.params) * 1e-9 + m['loss'] * 0
        timeit('train_step (8-cloud batch)', body, jnp.float32(0.0))

    # ---- loss forward only ---------------------------------------------
    if want('fwd'):
        def body(i, c):
            loss, _ = task._loss_fn(
                perturb(state.params, c), batch,
                jax.random.fold_in(jax.random.PRNGKey(0), i))
            return loss * 1e-9
        timeit('loss fwd (train=True)', body, jnp.float32(0.0))

        def body(i, c):
            loss, _ = task._loss_fn(
                perturb(state.params, c), batch,
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                train=False)
            return loss * 1e-9
        timeit('loss fwd (train=False)', body, jnp.float32(0.0))

    # ---- grad without optimizer ----------------------------------------
    if want('grad'):
        def body(i, c):
            (loss, _), grads = jax.value_and_grad(
                task._loss_fn, has_aux=True)(
                perturb(state.params, c), batch,
                jax.random.fold_in(jax.random.PRNGKey(0), i))
            return leaf_sum(grads) * 1e-9 + loss * 0
        timeit('value_and_grad', body, jnp.float32(0.0))

    # ---- optimizer alone -------------------------------------------------
    if want('opt'):
        grads0 = jax.jit(lambda p: jax.grad(
            lambda q: task._loss_fn(q, batch, jax.random.PRNGKey(0))[0]
        )(p))(state.params)

        def body(i, c):
            st2 = state.replace(params=perturb(state.params, c))
            st2 = st2.apply_gradients(grads=grads0)
            return leaf_sum(st2.params) * 1e-9
        timeit('apply_gradients', body, jnp.float32(0.0))

    if want('optAB'):
        # flat-vector AdamW vs per-leaf multi_transform, tx.update only
        from superpoint_transformer_tpu.optim.lr_scheduler import (
            make_optimizer)
        grads0 = jax.jit(lambda p: jax.grad(
            lambda q: task._loss_fn(q, batch, jax.random.PRNGKey(0))[0]
        )(p))(state.params)
        for flat in (True, False):
            tx = make_optimizer(total_steps=4000, num_warmup_steps=200,
                                params=state.params, flatten=flat)
            st0 = tx.init(state.params)

            def body(i, c, tx=tx, st0=st0):
                g = perturb(grads0, c)
                upd, _ = tx.update(g, st0, state.params)
                return leaf_sum(upd) * 1e-9
            timeit(f'tx.update flatten={flat}', body, jnp.float32(0.0))

    # ---- per-module components ------------------------------------------
    lvl0, lvl1 = batch[0], batch[1]
    if want('point'):
        from superpoint_transformer_tpu.nn.stage import PointStage
        net = task.net
        ps = PointStage(
            dim=net.point_mlp[-1], num_blocks=0,
            in_mlp=tuple(net.point_mlp), mlp_drop=net.point_drop,
            norm=net.norm, mlp_norm=net.mlp_norm,
            num_graphs=4, compute_dtype=net.compute_dtype)
        pvars = jax.jit(ps.init, static_argnames=('train', 'num_super'))(
            jax.random.PRNGKey(0), lvl0.x, lvl0.batch, pos=lvl0.pos,
            node_size=lvl0.node_size, super_index=lvl0.super_index,
            num_super=lvl1.capacity, mask=lvl0.node_mask, train=False)

        def body(i, c):
            out, diam = ps.apply(
                perturb(pvars, c), lvl0.x, lvl0.batch, pos=lvl0.pos,
                node_size=lvl0.node_size, super_index=lvl0.super_index,
                num_super=lvl1.capacity, mask=lvl0.node_mask,
                train=False)
            return leaf_sum(out) * 1e-9 + leaf_sum(diam) * 0
        timeit('point stage fwd (L0 164k)', body, jnp.float32(0.0))

        def body(i, c):
            g = jax.grad(lambda v: leaf_sum(ps.apply(
                v, lvl0.x, lvl0.batch, pos=lvl0.pos,
                node_size=lvl0.node_size, super_index=lvl0.super_index,
                num_super=lvl1.capacity, mask=lvl0.node_mask,
                train=False)[0]))(perturb(pvars, c))
            return leaf_sum(g) * 1e-9
        timeit('point stage fwd+bwd', body, jnp.float32(0.0))

    if want('pool'):
        from superpoint_transformer_tpu.nn.pool import pool
        x0 = jax.random.normal(jax.random.PRNGKey(0),
                               (lvl0.capacity, 64), jnp.float32)

        def body(i, c):
            out = pool('max', x0 + c * 1e-12, lvl0.super_index,
                       lvl1.capacity, mask=lvl0.node_mask)
            return leaf_sum(out) * 1e-9
        timeit('pool max L0->L1 fwd', body, jnp.float32(0.0))

        def body(i, c):
            g = jax.grad(lambda xx: leaf_sum(pool(
                'max', xx, lvl0.super_index, lvl1.capacity,
                mask=lvl0.node_mask)))(x0 + c * 1e-12)
            return leaf_sum(g) * 1e-9
        timeit('pool max L0->L1 fwd+bwd', body, jnp.float32(0.0))

    if want('usn'):
        from superpoint_transformer_tpu.nn.norm import unit_sphere_norm

        def body(i, c):
            out, diam = unit_sphere_norm(
                lvl0.pos + c * 1e-12, lvl0.super_index, lvl1.capacity,
                node_size=lvl0.node_size, mask=lvl0.node_mask)
            return leaf_sum(out) * 1e-9 + leaf_sum(diam) * 0
        timeit('unit_sphere_norm L0 fwd', body, jnp.float32(0.0))

        def body(i, c):
            g = jax.grad(lambda p: leaf_sum(unit_sphere_norm(
                p, lvl0.super_index, lvl1.capacity,
                node_size=lvl0.node_size, mask=lvl0.node_mask)[0]))(
                lvl0.pos + c * 1e-12)
            return leaf_sum(g) * 1e-9
        timeit('unit_sphere_norm L0 fwd+bwd', body, jnp.float32(0.0))

    if want('hedge'):
        from superpoint_transformer_tpu.nn.mlp import MLP
        net = task.net
        for ilvl in (1, 2, 3):
            lv = batch[ilvl]
            ef = lv.edge_feat
            N, K, De = ef.shape
            m = MLP(tuple(net.h_edge_mlp), norm=net.mlp_norm,
                    num_graphs=4, compute_dtype=net.compute_dtype)
            flat = ef.reshape(N * K, De)
            eb = jnp.repeat(lv.batch, K)
            em = lv.nbr_mask.reshape(N * K)
            mv = jax.jit(m.init, static_argnames='train')(
                jax.random.PRNGKey(0), flat, batch=eb, mask=em,
                train=False)

            def body(i, c, m=m, mv=mv, flat=flat, eb=eb, em=em):
                g = jax.grad(lambda v: leaf_sum(m.apply(
                    v, flat, batch=eb, mask=em, train=False)))(
                    perturb(mv, c))
                return leaf_sum(g) * 1e-9
            timeit(f'h_edge MLP L{ilvl} ({N}x{K}) fwd+bwd', body,
                   jnp.float32(0.0))

    if want('attn'):
        from superpoint_transformer_tpu.nn.transformer import (
            TransformerBlock)
        net = task.net
        for ilvl in (1, 2):
            lv = batch[ilvl]
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (lv.capacity, 64), jnp.float32)
            ef = jax.random.normal(
                jax.random.PRNGKey(2),
                (lv.capacity, lv.nbr_idx.shape[1], 32), jnp.float32)
            blk = TransformerBlock(
                dim=64, num_heads=net.down_num_heads,
                qk_dim=net.qk_dim, in_rpe_dim=32, no_ffn=net.no_ffn,
                k_rpe=True, q_rpe=True, v_rpe=True, norm=net.norm,
                num_graphs=4, compute_dtype=net.compute_dtype)
            bv = jax.jit(blk.init, static_argnames='train')(
                jax.random.PRNGKey(0), x, lv.batch,
                nbr_idx=lv.nbr_idx, nbr_mask=lv.nbr_mask,
                edge_feat=ef, mask=lv.node_mask, train=True,
                nbr_in_idx=lv.nbr_in_idx, nbr_in_mask=lv.nbr_in_mask)

            def body(i, c, blk=blk, bv=bv, x=x, ef=ef, lv=lv):
                g = jax.grad(lambda v: leaf_sum(blk.apply(
                    v, x, lv.batch, nbr_idx=lv.nbr_idx,
                    nbr_mask=lv.nbr_mask, edge_feat=ef,
                    mask=lv.node_mask, train=True,
                    nbr_in_idx=lv.nbr_in_idx,
                    nbr_in_mask=lv.nbr_in_mask,
                    rngs={'dropout': jax.random.PRNGKey(7)})))(
                    perturb(bv, c))
                return leaf_sum(g) * 1e-9
            timeit(f'attn block L{ilvl} train fwd+bwd', body,
                   jnp.float32(0.0))

    if want('loss'):
        from superpoint_transformer_tpu.loss.semantic import (
            multi_stage_loss)
        from superpoint_transformer_tpu.metrics.semantic import (
            confusion_matrix_from_histogram)
        logits = [jax.random.normal(
            jax.random.PRNGKey(3 + i), (batch[1 + i].capacity, 13),
            jnp.float32) for i in range(
            len(task.multi_stage_loss_lambdas))]
        y_hists, masks = task._targets(batch)

        def body(i, c):
            ls = [l + c * 1e-12 for l in logits]
            g = jax.grad(lambda l0: multi_stage_loss(
                [l0] + ls[1:], y_hists,
                task.multi_stage_loss_lambdas,
                loss_type=task.loss_type, node_masks=masks))(ls[0])
            cm = confusion_matrix_from_histogram(
                ls[0], batch[1].y, 13, node_mask=batch[1].node_mask)
            return leaf_sum(g) * 1e-9 + cm.sum().astype(
                jnp.float32) * 1e-12
        timeit('multi-stage loss+confmat f/b', body, jnp.float32(0.0))


if __name__ == '__main__':
    main(tuple(sys.argv[1:]))
