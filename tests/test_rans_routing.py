"""Property tests for the VPU lane-routing networks used by the in-kernel
rANS (coding/pallas_kernel.py): block-diagonal prefix sum, monotone
expand (decode word gather), monotone compaction (reverse-encode word
scatter), and block lane reversal. These run the pure-jnp forms (with
jnp.roll standing in for pltpu.roll, which is semantics-identical on the
lane axis) against numpy oracles over randomized need/emit patterns."""

import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.coding import pallas_kernel as pk


def _roll(x, s):
    return jnp.roll(x, s, 1)


R = pk.R


@pytest.mark.parametrize('bsub', [1, 2])
def test_prefix_excl_vpu(bsub):
    rng = np.random.RandomState(0)
    n = bsub * R
    for _ in range(50):
        ni = (rng.rand(1, n) < rng.rand()).astype(np.int32)
        got = np.asarray(pk._prefix_excl_vpu(jnp.asarray(ni), _roll))
        want = np.concatenate([
            np.concatenate([[0], np.cumsum(ni[0, i * R:(i + 1) * R])[:-1]])
            for i in range(bsub)])[None]
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('bsub', [1, 2])
def test_expand_words_vpu(bsub):
    rng = np.random.RandomState(1)
    n = bsub * R
    for _ in range(100):
        ni = (rng.rand(1, n) < rng.rand()).astype(np.int32)
        win = rng.randint(0, 1 << 16, size=(1, n)).astype(np.int32)
        rank = np.asarray(pk._prefix_excl_vpu(jnp.asarray(ni), _roll))
        got = np.asarray(pk._expand_words_vpu(
            jnp.asarray(win), jnp.asarray(ni), jnp.asarray(rank), _roll))
        for i in range(bsub):
            blk = slice(i * R, (i + 1) * R)
            need = ni[0, blk] != 0
            want = win[0, blk][rank[0, blk]]
            np.testing.assert_array_equal(got[0, blk][need], want[need])


@pytest.mark.parametrize('bsub', [1, 2])
def test_compact_and_reverse_vpu(bsub):
    rng = np.random.RandomState(2)
    n = bsub * R
    for _ in range(100):
        ei = (rng.rand(1, n) < rng.rand()).astype(np.int32)
        word = rng.randint(0, 1 << 16, size=(1, n)).astype(np.int32)
        fwd = np.asarray(pk._prefix_excl_vpu(jnp.asarray(ei), _roll))
        dense = np.asarray(pk._compact_vpu(
            jnp.asarray(word), jnp.asarray(ei), jnp.asarray(fwd), _roll))
        rev = np.asarray(pk._block_reverse_vpu(jnp.asarray(dense), _roll))
        for i in range(bsub):
            blk = slice(i * R, (i + 1) * R)
            srcs = np.nonzero(ei[0, blk])[0]
            total = len(srcs)
            # ascending compaction
            np.testing.assert_array_equal(dense[0, blk][:total],
                                          word[0, blk][srcs])
            # block reversal: rev[k] = dense[R-1-k]
            np.testing.assert_array_equal(rev[0, blk], dense[0, blk][::-1])
            # the kernel's placement: stream[goff+k] = word of the
            # (total-1-k)-th emitting lane
            pad = np.concatenate([rev[0, blk], np.zeros(256 - R, np.int32)])
            for goff in (0, 17, 100):
                place = np.roll(pad, goff + total - R)
                want = word[0, blk][srcs[::-1]]
                np.testing.assert_array_equal(
                    place[goff:goff + total], want)
