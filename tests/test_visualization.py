"""Dependency-free 3D viewer: HTML export + matplotlib PNG backend."""
import numpy as np

from superpoint_transformer_tpu.utils.synthetic import random_nag
from superpoint_transformer_tpu.visualization import (
    visualize_3d, class_palette)


def test_palette_distinct():
    pal = class_palette(13)
    assert pal.shape == (13, 3) and pal.dtype == np.uint8
    assert np.unique(pal, axis=0).shape[0] == 13


def test_visualize_nag_html_and_png(tmp_path):
    nag = random_nag(seed=0, n_points=500)
    nag[0]['rgb'] = np.random.default_rng(0).random(
        (nag[0].num_nodes, 3)).astype(np.float32)
    fig = visualize_3d(nag, max_points=200, num_classes=13)
    path = fig.write_html(str(tmp_path / 'scene.html'))
    html = open(path).read()
    assert '<canvas' in html and 'LAYERS' in html
    assert len(html) < 5_000_000
    png = fig.to_png(str(tmp_path / 'scene.png'))
    assert (tmp_path / 'scene.png').stat().st_size > 1000
