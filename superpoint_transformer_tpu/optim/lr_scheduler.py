"""Optimizer and LR schedule construction with optax (reference
src/optim/lr_scheduler.py: CosineAnnealingLRWithWarmup is the default,
configs/model/semantic/default.yaml:31-37; differential transformer LR
mirrors SemanticSegmentationModule.configure_optimizers,
src/models/semantic.py:1245-1268).
"""
import jax
import optax

__all__ = ['cosine_with_warmup', 'make_optimizer', 'make_schedule',
           'step_with_warmup', 'multi_step_with_warmup',
           'exponential_with_warmup', 'cosine_power_with_warmup']


def cosine_with_warmup(lr, total_steps, num_warmup_steps,
                       warmup_init_lr=1e-6, eta_min=1e-6,
                       warmup_strategy='cos'):
    """CosineAnnealingLRWithWarmup: warmup from `warmup_init_lr` to
    `lr` over `num_warmup_steps` ('cos' or 'linear' shape), then
    cosine-anneal to `eta_min` over the remaining steps."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.asarray(num_warmup_steps, jnp.float32)
        t = jnp.asarray(total_steps, jnp.float32)
        if warmup_strategy == 'linear':
            frac = jnp.clip(step / jnp.maximum(w, 1), 0, 1)
        else:  # 'cos'
            frac = 0.5 * (1 - jnp.cos(
                jnp.pi * jnp.clip(step / jnp.maximum(w, 1), 0, 1)))
        warm = warmup_init_lr + (lr - warmup_init_lr) * frac
        progress = jnp.clip(
            (step - w) / jnp.maximum(t - w, 1), 0, 1)
        cos = eta_min + (lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < w, warm, cos)

    return schedule


def _is_transformer_param(path):
    """Transformer & pool params get a scaled LR (reference
    configure_optimizers: names containing 'transformer_blocks' or
    'down_pool_block'). In our module tree these live under block_*/sa
    and down_pool_block."""
    keys = [getattr(p, 'key', str(p)) for p in path]
    joined = '/'.join(str(k) for k in keys)
    return ('block_' in joined and ('/sa/' in joined + '/'
                                    or joined.endswith('/sa'))) \
        or 'down_pool_block' in joined


def flatten_by_group(transforms_by_label, labels):
    """Run each labelled transform over ONE flat concatenated vector
    instead of ~200 small leaves (elementwise transforms like AdamW are
    exactly equivalent on the concatenation). The flagship model's
    param tree has hundreds of tiny tensors; per-leaf AdamW lowers to
    hundreds of small fused kernels whose fixed launch cost dominates
    the optimizer update on TPU — per-group flat vectors reduce it to
    a few kernels, with the final per-leaf updates recovered by slices
    (which XLA fuses into the param adds).

    Leaves are sub-grouped by (label, dtype) — state keys look like
    'base:float32' — because concatenating a mixed-dtype group would
    silently promote every leaf to the widest dtype and run the
    moments/updates at the promoted precision.

    NOTE: the opt_state pytree differs from optax.multi_transform's
    (a {label:dtype -> optax state on one flat vector} dict instead of
    MultiTransformState over the param tree), so checkpoints saved
    with flatten=False cannot be restored into a flatten=True
    optimizer or vice versa — pass the same `flatten` used at save
    time to make_optimizer when resuming.
    """
    import jax.numpy as jnp

    # sub-group keys derived from the actual leaves, so groups are
    # never empty (empty groups would put zero-size arrays in the
    # optimizer state, which orbax refuses to save)
    def group_meta(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        lab = jax.tree_util.tree_leaves(labels)
        assert len(lab) == len(leaves)
        keys = [f'{g}:{l.dtype}' for g, l in zip(lab, leaves)]
        return leaves, treedef, keys, list(dict.fromkeys(keys))

    def flatten(tree):
        leaves, _, keys, groups = group_meta(tree)
        return {g: jnp.concatenate(
            [l.reshape(-1) for l, kl in zip(leaves, keys) if kl == g])
            for g in groups}

    def unflatten(flat, like):
        leaves, treedef, keys, groups = group_meta(like)
        offs = {g: 0 for g in groups}
        out = []
        for l, g in zip(leaves, keys):
            n = l.size
            seg = flat[g][offs[g]:offs[g] + n]
            out.append(seg.reshape(l.shape).astype(l.dtype))
            offs[g] += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        fp = flatten(params)
        return {g: transforms_by_label[g.split(':')[0]].init(fp[g])
                for g in fp}

    def update(updates, state, params=None):
        fu = flatten(updates)
        fp = flatten(params) if params is not None else \
            {g: None for g in fu}
        new_state, fo = {}, {}
        for g in fu:
            fo[g], new_state[g] = transforms_by_label[
                g.split(':')[0]].update(fu[g], state[g], fp[g])
        return unflatten(fo, updates), new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(lr=0.01, weight_decay=1e-4, transformer_lr_scale=0.1,
                   total_steps=100_000, num_warmup_steps=2_000,
                   warmup_init_lr=1e-6, eta_min=1e-6, params=None,
                   flatten=True):
    """AdamW with cosine-warmup schedule; attention parameters run at
    `transformer_lr_scale * lr` (reference semantic.py:1245-1268).
    With `flatten` (default) each LR group's AdamW runs on one flat
    concatenated vector (identical math, far fewer TPU kernels).
    `flatten` changes the opt_state pytree — resume checkpoints with
    the same setting they were saved under (see flatten_by_group)."""
    base_sched = cosine_with_warmup(
        lr, total_steps, num_warmup_steps,
        warmup_init_lr=warmup_init_lr, eta_min=eta_min)
    tr_sched = cosine_with_warmup(
        lr * transformer_lr_scale, total_steps, num_warmup_steps,
        warmup_init_lr=warmup_init_lr, eta_min=eta_min)

    def adamw(sched):
        return optax.adamw(sched, weight_decay=weight_decay)

    if params is None:
        return adamw(base_sched)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: 'transformer' if _is_transformer_param(path)
        else 'base', params)
    transforms = {'base': adamw(base_sched),
                  'transformer': adamw(tr_sched)}
    if flatten:
        return flatten_by_group(transforms, labels)
    return optax.multi_transform(transforms, labels)


def _with_warmup(lr, body, num_warmup_steps, warmup_init_lr=1e-6,
                 warmup_strategy='cos'):
    """Wrap any post-warmup schedule `body(step_after_warmup)` with the
    reference's _WarmupLR prefix (src/optim/lr_scheduler.py:22)."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.asarray(num_warmup_steps, jnp.float32)
        if warmup_strategy == 'linear':
            frac = jnp.clip(step / jnp.maximum(w, 1), 0, 1)
        else:
            frac = 0.5 * (1 - jnp.cos(
                jnp.pi * jnp.clip(step / jnp.maximum(w, 1), 0, 1)))
        warm = warmup_init_lr + (lr - warmup_init_lr) * frac
        return jnp.where(step < w, warm,
                         body(jnp.maximum(step - w, 0)))

    return schedule


def step_with_warmup(lr, step_size, gamma=0.1, num_warmup_steps=0,
                     **kw):
    """StepLRWithWarmup (reference src/optim/lr_scheduler.py:157)."""
    import jax.numpy as jnp
    return _with_warmup(
        lr, lambda s: lr * gamma ** jnp.floor(s / step_size),
        num_warmup_steps, **kw)


def multi_step_with_warmup(lr, milestones, gamma=0.1,
                           num_warmup_steps=0, **kw):
    """MultiStepLRWithWarmup."""
    import jax.numpy as jnp
    ms = jnp.asarray(list(milestones), jnp.float32)
    return _with_warmup(
        lr, lambda s: lr * gamma ** jnp.sum(s >= ms),
        num_warmup_steps, **kw)


def exponential_with_warmup(lr, gamma=0.999, num_warmup_steps=0, **kw):
    """ExponentialLRWithWarmup."""
    return _with_warmup(lr, lambda s: lr * gamma ** s,
                        num_warmup_steps, **kw)


def cosine_power_with_warmup(lr, total_steps, power=2.0, eta_min=1e-6,
                             num_warmup_steps=0, **kw):
    """Cosine-power annealing (sharper-than-cosine decay)."""
    import jax.numpy as jnp

    def body(s):
        t = jnp.maximum(total_steps - num_warmup_steps, 1)
        progress = jnp.clip(s / t, 0, 1)
        return eta_min + (lr - eta_min) * (
            0.5 * (1 + jnp.cos(jnp.pi * progress))) ** power

    return _with_warmup(lr, body, num_warmup_steps, **kw)


def make_schedule(name, lr, total_steps, num_warmup_steps=0, **kw):
    """Factory over the reference scheduler family
    (src/optim/lr_scheduler.py:157-240)."""
    if name in (None, 'cosine', 'cos'):
        return cosine_with_warmup(lr, total_steps, num_warmup_steps,
                                  **kw)
    if name == 'step':
        return step_with_warmup(lr, num_warmup_steps=num_warmup_steps,
                                **kw)
    if name == 'multistep':
        return multi_step_with_warmup(
            lr, num_warmup_steps=num_warmup_steps, **kw)
    if name == 'exponential':
        return exponential_with_warmup(
            lr, num_warmup_steps=num_warmup_steps, **kw)
    if name == 'cosine_power':
        return cosine_power_with_warmup(
            lr, total_steps, num_warmup_steps=num_warmup_steps, **kw)
    raise ValueError(f'unknown scheduler {name}')


def warmup_constant(lr, num_warmup_steps=0, warmup_init_lr=1e-6,
                    warmup_strategy='cos'):
    """Warmup then constant — the base schedule under the plateau
    controller (reference ReduceLROnPlateauWithWarmup,
    src/optim/lr_scheduler.py:236: warmup prefix, then the plateau
    logic owns the decay)."""
    return _with_warmup(lr, lambda s: s * 0 + lr, num_warmup_steps,
                        warmup_init_lr=warmup_init_lr,
                        warmup_strategy=warmup_strategy)


class ReduceOnPlateau:
    """Host-side plateau controller (torch ReduceLROnPlateau
    semantics, used by the reference's plateau scheduler family).
    Call `step(metric)` once per validation; read `multiplier` and
    push it into the optimizer state with `set_lr_multiplier`.

    In a functional/jit world the learning rate cannot depend on a
    host metric through the compiled schedule, so the decay factor
    rides the optimizer state as an injected hyperparameter — no
    retrace when it changes."""

    def __init__(self, mode='max', factor=0.1, patience=10,
                 threshold=1e-4, threshold_mode='rel', cooldown=0,
                 min_mult=1e-8):
        assert mode in ('min', 'max')
        assert threshold_mode in ('rel', 'abs')
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.min_mult = float(min_mult)
        self.best = None
        self.num_bad = 0
        self.cooldown_counter = 0
        self.multiplier = 1.0

    def _is_better(self, a, best):
        if self.threshold_mode == 'rel':
            eps = self.threshold * abs(best)
        else:
            eps = self.threshold
        return a > best + eps if self.mode == 'max' else a < best - eps

    def step(self, metric):
        """Returns True when the multiplier was just reduced."""
        m = float(metric)
        if self.best is None or self._is_better(m, self.best):
            self.best = m
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.multiplier = max(self.multiplier * self.factor,
                                  self.min_mult)
            self.num_bad = 0
            self.cooldown_counter = self.cooldown
            return True
        return False


def make_plateau_optimizer(lr=0.01, weight_decay=1e-4,
                           transformer_lr_scale=0.1,
                           num_warmup_steps=2_000,
                           warmup_init_lr=1e-6, params=None):
    """AdamW with warmup-then-constant schedule, wrapped so a scalar
    `lr_mult` hyperparameter (driven by ReduceOnPlateau) scales the
    updates. The multiplier lives in the optimizer state: updating it
    between steps does not retrace the jitted train step."""
    base_sched = warmup_constant(lr, num_warmup_steps, warmup_init_lr)
    tr_sched = warmup_constant(lr * transformer_lr_scale,
                               num_warmup_steps, warmup_init_lr)

    def adamw(sched):
        return optax.adamw(sched, weight_decay=weight_decay)

    if params is None:
        inner = adamw(base_sched)
    else:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: 'transformer'
            if _is_transformer_param(path) else 'base', params)
        inner = optax.multi_transform(
            {'base': adamw(base_sched),
             'transformer': adamw(tr_sched)}, labels)

    @optax.inject_hyperparams
    def wrap(lr_mult):
        return optax.chain(inner, optax.scale(lr_mult))

    return wrap(lr_mult=1.0)


def set_lr_multiplier(opt_state, multiplier):
    """Return a copy of `opt_state` with the plateau `lr_mult`
    hyperparameter replaced (recurses through wrappers such as
    optax.MultiSteps)."""
    import jax.numpy as jnp

    if hasattr(opt_state, 'hyperparams') and \
            'lr_mult' in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp['lr_mult'] = jnp.asarray(
            multiplier, dtype=jnp.asarray(hp['lr_mult']).dtype)
        return opt_state._replace(hyperparams=hp)
    if hasattr(opt_state, '_replace') and hasattr(opt_state, '_fields'):
        updates = {}
        for field in opt_state._fields:
            v = getattr(opt_state, field)
            nv = set_lr_multiplier(v, multiplier)
            if nv is not v:
                updates[field] = nv
        return opt_state._replace(**updates) if updates else opt_state
    if isinstance(opt_state, (tuple, list)):
        out = type(opt_state)(
            set_lr_multiplier(s, multiplier) for s in opt_state)
        changed = any(a is not b for a, b in zip(out, opt_state))
        return out if changed else opt_state
    return opt_state
