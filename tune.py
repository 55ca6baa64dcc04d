"""Hyperparameter search CLI (analogue of the reference's hydra
multirun + Optuna sweeper surface, configs/hparams_search/ +
`python src/train.py -m hparams_search=...`):

    python tune.py experiment=semantic/s3dis n_trials=8 \
        'space.model.optimizer.lr=loguniform(1e-3,0.5)' \
        'space.model.optimizer.weight_decay=choice(1e-4,1e-3,1e-2)' \
        [trainer.max_epochs=50 ...]

Random search: each trial samples the declared space, runs train.main
with the sampled overrides, and the best trial (highest return metric,
i.e. best val mIoU/PQ) is reported and written to
<output_dir>/tune_results.json.
"""
import json
import os
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np


def parse_space(spec):
    """'loguniform(a,b)' | 'uniform(a,b)' | 'choice(x,y,...)'."""
    m = re.fullmatch(r'(\w+)\((.*)\)', spec.strip())
    if not m:
        raise ValueError(f'bad search-space spec: {spec}')
    kind, args = m.group(1), [a.strip() for a in m.group(2).split(',')]
    if kind in ('uniform', 'loguniform'):
        lo, hi = float(args[0]), float(args[1])
        return kind, (lo, hi)
    if kind == 'choice':
        vals = []
        for a in args:
            try:
                vals.append(json.loads(a))
            except Exception:
                vals.append(a)
        return kind, vals
    raise ValueError(f'unknown space kind: {kind}')


def sample(space, rng):
    out = {}
    for key, (kind, arg) in space.items():
        if kind == 'uniform':
            out[key] = float(rng.uniform(*arg))
        elif kind == 'loguniform':
            lo, hi = np.log(arg[0]), np.log(arg[1])
            out[key] = float(np.exp(rng.uniform(lo, hi)))
        else:
            out[key] = arg[int(rng.integers(len(arg)))]
    return out


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    space, passthrough, n_trials, seed = {}, [], 10, 0
    out_root = 'outputs/tune'
    for a in argv:
        key, _, val = a.partition('=')
        if key == 'n_trials':
            n_trials = int(val)
        elif key == 'tune_dir':
            out_root = val
        elif key == 'seed':
            seed = int(val)
            passthrough.append(a)
        elif key.startswith('space.'):
            space[key[len('space.'):]] = parse_space(val)
        else:
            passthrough.append(a)
    if not space:
        raise SystemExit('declare at least one space.<key>=... range')

    import train as train_cli
    rng = np.random.default_rng(seed)
    results = []
    for t in range(n_trials):
        params = sample(space, rng)
        overrides = passthrough + [
            f'{k}={v}' for k, v in params.items()] + [
            f'output_dir={out_root}/trial_{t}']
        print(f'[trial {t}] {params}')
        try:
            score = train_cli.main(overrides)
        except Exception as e:  # noqa: BLE001 — a bad trial is data
            print(f'[trial {t}] FAILED: {e}')
            score = None
        results.append({'trial': t, 'params': params,
                        'score': None if score is None
                        else float(score)})
        os.makedirs(out_root, exist_ok=True)
        with open(osp.join(out_root, 'tune_results.json'), 'w') as f:
            json.dump(results, f, indent=1)
    ok = [r for r in results if r['score'] is not None]
    if ok:
        best = max(ok, key=lambda r: r['score'])
        print(f"best trial {best['trial']}: score={best['score']:.4f} "
              f"params={best['params']}")
        return best
    return None


if __name__ == '__main__':
    main()
