"""Native FLAC leg: differential battery against the pure-Python
decoder (the source of truth). The bail rule makes error semantics
Python-exact by construction; these tests pin the other side — that
the native happy path emits byte-identical samples — plus the
mutation-fuzz agreement that a corrupted stream can never decode to
different results on the two legs."""

import random

import numpy as np
import pytest

from tl_spark.kernel import native_flac
from tl_spark.operators import flac as flac_mod
from tl_spark.operators.flac import flac_bytes, flac_decode, synth_pcm

pytestmark = pytest.mark.skipif(
    native_flac.load() is None, reason="native cdylib not present"
)


def _python_decode(payload, monkeypatch, verify_md5=True):
    with monkeypatch.context() as m:
        m.setattr(native_flac, "decode", lambda *a: None)
        return flac_decode(payload, verify_md5=verify_md5)


def test_native_leg_actually_engages():
    enc = flac_bytes(synth_pcm(1, 2000, 2), 44100)
    assert native_flac.decode(enc, True) is not None


@pytest.mark.parametrize(
    "strategy",
    ["auto", "constant", "verbatim", "fixed0", "fixed2", "fixed4",
     "lpc1", "lpc8", "lpc32"],
)
@pytest.mark.parametrize(
    "mode", ["indep", "left_side", "right_side", "mid_side"]
)
def test_differential_grid(strategy, mode, monkeypatch):
    pcm = (
        np.full((2500, 2), -7, dtype=np.int64)
        if strategy == "constant"
        else synth_pcm(5, 2500, 2)
    )
    enc = flac_bytes(
        pcm, 48000, block_size=1000, channel_mode=mode, strategy=strategy,
        rice_partition_order=2,
    )
    nat = native_flac.decode(enc, True)
    assert nat is not None, "native leg bailed on a valid stream"
    py_s, py_r = _python_decode(enc, monkeypatch)
    assert nat[1] == py_r and (nat[0] == py_s).all()


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_differential_bps(bps, monkeypatch):
    base = synth_pcm(5, 2000, 2)
    pcm = base >> (16 - bps) if bps < 16 else base << (bps - 16)
    enc = flac_bytes(pcm, 32000, bps=bps)
    nat = native_flac.decode(enc, True)
    assert nat is not None
    py_s, py_r = _python_decode(enc, monkeypatch)
    assert nat[1] == py_r and (nat[0] == py_s).all()


def test_differential_wasted_and_escape(monkeypatch):
    pcm = (synth_pcm(9, 2048, 2) >> 4) << 4
    enc = flac_bytes(pcm, 44100, strategy="fixed2", wasted_bits=4)
    nat = native_flac.decode(enc, True)
    assert nat is not None
    assert (nat[0] == _python_decode(enc, monkeypatch)[0]).all()
    pcm = synth_pcm(1, 2048, 2)
    enc = flac_bytes(pcm, 44100, strategy="fixed1", escape_raw=20,
                     rice_partition_order=2, rice2=True)
    nat = native_flac.decode(enc, True)
    assert nat is not None
    assert (nat[0] == _python_decode(enc, monkeypatch)[0]).all()


def test_mutation_fuzz_outcome_agreement(monkeypatch):
    """For every corruption: the public decode (native + Python
    replay on bail) and the forced-Python decode must agree — same
    samples or both ValueError. A native leg that decodes corrupted
    bytes to DIFFERENT samples than Python would split this."""
    random.seed(13)
    pcm = synth_pcm(11, 2500, 2)
    enc = flac_bytes(pcm, 44100, block_size=1152)
    agree_err = agree_ok = 0
    for _ in range(1200):
        buf = bytearray(enc)
        k = random.randrange(3)
        if k == 0:
            buf[random.randrange(len(buf))] ^= 1 << random.randrange(8)
        elif k == 1:
            buf = buf[: random.randrange(len(buf))]
        else:
            for _ in range(random.randrange(1, 8)):
                buf[random.randrange(len(buf))] ^= random.randrange(1, 256)
        payload = bytes(buf)
        try:
            pub = flac_decode(payload)
        except ValueError:
            pub = None
        try:
            ref = _python_decode(payload, monkeypatch)
        except ValueError:
            ref = None
        if pub is None or ref is None:
            assert pub is None and ref is None, "error-outcome divergence"
            agree_err += 1
        else:
            assert pub[1] == ref[1] and (pub[0] == ref[0]).all()
            agree_ok += 1
    assert agree_err > 1000  # corruption is almost always caught


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("TL_SPARK_NATIVE_FLAC", "0")
    import importlib

    nf = importlib.reload(native_flac)
    try:
        assert nf.load() is None
    finally:
        monkeypatch.undo()
        importlib.reload(native_flac)
        importlib.reload(flac_mod)


def test_md5_skip_flag_passthrough(monkeypatch):
    enc = bytearray(flac_bytes(synth_pcm(4, 1500, 1), 44100))
    enc[4 + 4 + 18] ^= 0xFF  # tamper STREAMINFO MD5
    payload = bytes(enc)
    with pytest.raises(ValueError):
        flac_decode(payload)  # native bails, Python raises
    dec, _ = flac_decode(payload, verify_md5=False)
    ref = _python_decode(payload, monkeypatch, verify_md5=False)
    assert (dec == ref[0]).all()
