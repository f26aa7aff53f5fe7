"""tools/make_records.py — dataset prep (ref README.md:139-212 workflow).

The pure-Python writer must interoperate byte-level with TensorFlow's
TFRecord stack in BOTH directions: our reader consumes TF-written shards
(covered in test_training.py) and TF's reader must consume ours."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from imgcomp_cvpr_tpu.data import pipeline
from imgcomp_cvpr_tpu.tools import make_records as mr


def _write_pngs(tmp_path, n, size=24, seed=0):
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f'img_{i:03d}.png')
        Image.fromarray(img).save(p)
        paths.append((p, img))
    return paths


def test_pure_python_shards_roundtrip(tmp_path):
    src = tmp_path / 'src'
    src.mkdir()
    paths = _write_pngs(src, 5)
    out = str(tmp_path / 'records')
    shards = mr.make_records(str(src), out, prefix='train',
                             num_per_shard=2, force_py=True)
    assert len(shards) == 3 and all(os.path.exists(s) for s in shards)
    # offset index built eagerly by write_shard
    assert all(os.path.exists(s + '.idx.npy') for s in shards)
    ds = pipeline.get_dataset(os.path.join(out, '*.tfrecord'))
    assert ds.num_images == 5
    # PNG pass-through is lossless: decoded pixels match the sources
    for i, (_, img) in enumerate(paths):
        np.testing.assert_array_equal(ds.load(i), img)


def test_tf_reads_pure_python_shards(tmp_path):
    tf = pytest.importorskip('tensorflow')
    src = tmp_path / 'src'
    src.mkdir()
    paths = _write_pngs(src, 3, seed=7)
    out = str(tmp_path / 'records')
    (shard,) = mr.make_records(str(src), out, prefix='val',
                               num_per_shard=10, force_py=True)
    got = []
    for raw in tf.data.TFRecordDataset([shard]):
        ex = tf.io.parse_single_example(raw, {
            'image/encoded': tf.io.FixedLenFeature([], tf.string)})
        img = np.asarray(Image.open(io.BytesIO(
            ex['image/encoded'].numpy())).convert('RGB'))
        got.append(img)
    assert len(got) == 3
    for (_, img), g in zip(paths, got):
        np.testing.assert_array_equal(g, img)


def test_resize_shorter_side(tmp_path):
    src = tmp_path / 'src'
    src.mkdir()
    img = (np.random.RandomState(1).rand(40, 80, 3) * 255).astype(np.uint8)
    p = str(src / 'wide.png')
    Image.fromarray(img).save(p)
    out = str(tmp_path / 'records')
    mr.make_records(str(src), out, prefix='train', resize=16, force_py=True)
    ds = pipeline.get_dataset(os.path.join(out, '*.tfrecord'))
    dec = ds.load(0)
    assert dec.shape == (16, 32, 3)   # shorter side 16, aspect preserved


def test_masked_crc_matches_tf_framing(tmp_path):
    """Byte-identical framing: the same payload written by the pure-Python
    writer and TF's writer produces identical files."""
    tf = pytest.importorskip('tensorflow')
    payload = mr.serialize_example(b'hello world', 'image/encoded')
    p_py = str(tmp_path / 'py.tfrecord')
    p_tf = str(tmp_path / 'tf.tfrecord')
    with mr._PyRecordWriter(p_py) as w:
        w.write(payload)
    with tf.io.TFRecordWriter(p_tf) as w:
        w.write(payload)
    with open(p_py, 'rb') as a, open(p_tf, 'rb') as b:
        assert a.read() == b.read()
