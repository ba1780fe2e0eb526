"""Test-only mp3 encoding via the system's libmp3lame (ctypes).

Lets the suite synthesize mp3 fixtures for the Common Voice pipeline
without shipping binary files; decoding goes through the framework's
native libmpg123 path (native/audio.cc).
"""

import ctypes

import numpy as np


def lame_available() -> bool:
    try:
        ctypes.CDLL("libmp3lame.so.0")
        return True
    except OSError:
        return False


def encode_mp3(pcm: np.ndarray, sample_rate: int, path: str,
               bitrate: int = 64) -> None:
    """Encode mono float32 pcm in [-1, 1] to an mp3 file."""
    pcm = np.ascontiguousarray(pcm, np.float32)
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, sample_rate)
    lame.lame_set_out_samplerate(gfp, sample_rate)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_mode(gfp, 3)  # mono
    lame.lame_set_brate(gfp, bitrate)
    assert lame.lame_init_params(gfp) >= 0
    buf = (ctypes.c_ubyte * (len(pcm) * 2 + 7200))()
    lame.lame_encode_buffer_ieee_float.restype = ctypes.c_int
    n = lame.lame_encode_buffer_ieee_float(
        gfp, pcm.ctypes.data_as(ctypes.c_void_p),
        pcm.ctypes.data_as(ctypes.c_void_p), len(pcm), buf, len(buf))
    assert n >= 0, n
    n2 = lame.lame_encode_flush(gfp, ctypes.byref(buf, n), len(buf) - n)
    assert n2 >= 0, n2
    with open(path, "wb") as f:
        f.write(bytes(buf[:n + n2]))
    lame.lame_close(gfp)
