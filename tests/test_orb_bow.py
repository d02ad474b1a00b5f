import numpy as np
import pytest

from lv_slam_tpu.graph.bow import Vocabulary
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops.orb import OrbExtractor, match_score


@pytest.fixture(scope="module")
def views():
    """Images from distinct and revisited viewpoints in one world."""
    world = synthetic.make_world(seed=13, n_buildings=80, n_poles=100)

    def cam(x, y, yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        pose[:3, 3] = [x, y, 1.6]
        return synthetic.render_camera_image(world, pose, seed=13)

    img_a = cam(0.0, 0.0, 0.0)
    img_a2 = cam(0.6, 0.2, 0.04)       # nearly the same place
    img_b = cam(60.0, -40.0, 2.0)      # a different place
    return img_a, img_a2, img_b


def test_orb_detects_corners(views):
    img_a, _, _ = views
    orb = OrbExtractor(max_features=256)
    desc, kpts = orb.detect_and_compute(img_a)
    assert desc.shape[0] > 50, desc.shape
    assert desc.shape[1] == 32 and desc.dtype == np.uint8
    assert kpts.shape[0] == desc.shape[0]


def test_match_score_discriminates(views):
    img_a, img_a2, img_b = views
    orb = OrbExtractor(max_features=256)
    da, _ = orb.detect_and_compute(img_a)
    da2, _ = orb.detect_and_compute(img_a2)
    db, _ = orb.detect_and_compute(img_b)
    same = match_score(da, da2)
    self_score = match_score(da, da)
    diff = match_score(da, db)
    assert self_score > 0.9
    assert same > diff * 2, (same, diff)
    assert same > 0.04, same  # passes the loop-detector gate


def test_vocabulary_scoring(views):
    img_a, img_a2, img_b = views
    orb = OrbExtractor(max_features=256)
    descs = [orb.detect_and_compute(img)[0] for img in views]
    vocab = Vocabulary.train(descs, n_words=128, iters=5)
    s_same = vocab.score(descs[0], descs[1])
    s_diff = vocab.score(descs[0], descs[2])
    s_self = vocab.score(descs[0], descs[0])
    assert s_self > 0.99
    assert s_same > s_diff, (s_same, s_diff)
    assert s_same > 0.04, s_same


def test_vocabulary_save_load(views, tmp_path):
    orb = OrbExtractor(max_features=128)
    descs = [orb.detect_and_compute(img)[0] for img in views]
    vocab = Vocabulary.train(descs, n_words=64, iters=3)
    path = str(tmp_path / "vocab.npz")
    vocab.save(path)
    loaded = Vocabulary.load(path)
    np.testing.assert_allclose(
        vocab.score(descs[0], descs[1]), loaded.score(descs[0], descs[1]), rtol=1e-6
    )
