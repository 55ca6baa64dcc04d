"""One-shot 18M-point end-to-end inference measurement (VERDICT r2
item 4; reference headline: 18M raw points / 7.8 km^2 in 10.1 s on one
GPU including partition, /root/reference/README.md:103).

Runs bench.py's e2e path at the full headline size: DALES-density
synthetic aerial tile -> xy tiling -> preprocessing (single core HERE,
per-tile fan-out in production) -> shared-signature whole-tile
forwards -> full-res recovery. Prints one JSON line; the number is
recorded in STATUS.md / docs/performance.md.

Run on the chip:  python tools/run_e2e_18m_chip.py [n_points]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n_points=18_000_000):
    os.environ['SPT_BENCH_E2E_POINTS'] = str(n_points)
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import bench
    bench.E2E_POINTS = n_points
    info = bench._bench_e2e_inference()
    print(json.dumps(info), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 18_000_000)
