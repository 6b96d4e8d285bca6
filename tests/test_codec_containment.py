"""Cross-codec containment fuzz: every binary parser must return a
value or None on ANY input — truncated prefixes, single-byte flips,
random garbage — and never raise.  An exception escaping a parser
kills the whole Arrow batch (and with it the Spark task), so this
contract is what keeps a 100 TB decode job alive on dirty data; the
per-codec suites pin exact semantics, this one pins survivability."""

from __future__ import annotations

import random

import pytest

from pdf_extraction_spark.operators.ico import parse_ico, synth_ico_bytes
from pdf_extraction_spark.operators.jpeg import (
    jpeg_dimensions,
    parse_jpeg,
    synth_jpeg_bytes,
    synth_jpeg_mixed_bytes,
    synth_jpeg_progressive_bytes,
)
from pdf_extraction_spark.operators.mp3 import probe_mp3, synth_mp3_bytes
from pdf_extraction_spark.operators.mp4 import probe_mp4, synth_mp4_bytes
from pdf_extraction_spark.operators.multimodal import (
    parse_gif,
    parse_gif_frames,
    parse_png,
    synth_gif_animated_bytes,
    synth_gif_bytes,
    synth_png_bytes,
    synth_png_interlaced_bytes,
)
from pdf_extraction_spark.operators.tiff import (
    parse_tiff,
    synth_tiff_bytes,
    synth_tiff_g4_bytes,
)

CODECS = [
    ("png", synth_png_bytes, parse_png),
    ("png_adam7", synth_png_interlaced_bytes, parse_png),
    ("gif", synth_gif_bytes, parse_gif),
    ("gif_animated", synth_gif_animated_bytes, parse_gif_frames),
    ("jpeg", synth_jpeg_bytes, parse_jpeg),
    ("jpeg_progressive", synth_jpeg_progressive_bytes, parse_jpeg),
    ("jpeg_meta", synth_jpeg_mixed_bytes, jpeg_dimensions),
    ("tiff", synth_tiff_bytes, parse_tiff),
    ("tiff_g4", synth_tiff_g4_bytes, parse_tiff),
    ("ico", synth_ico_bytes, parse_ico),
    ("mp4", synth_mp4_bytes, probe_mp4),
    ("mp3", synth_mp3_bytes, probe_mp3),
]


@pytest.mark.parametrize("name,synth,parse", CODECS, ids=[c[0] for c in CODECS])
def test_truncation_never_raises(name, synth, parse):
    for mid in (0, 1, 5):
        blob = synth(mid)
        for cut in range(0, len(blob), 3):
            parse(blob[:cut])  # value or None — an exception fails the test


@pytest.mark.parametrize("name,synth,parse", CODECS, ids=[c[0] for c in CODECS])
def test_byte_flips_never_raise(name, synth, parse):
    rng = random.Random(hash(name) & 0xFFFF)
    for mid in (0, 3):
        blob = synth(mid)
        for _ in range(150):
            i = rng.randrange(len(blob))
            mutated = (
                blob[:i] + bytes([blob[i] ^ (1 + rng.randrange(255))]) + blob[i + 1 :]
            )
            parse(mutated)


@pytest.mark.parametrize("name,synth,parse", CODECS, ids=[c[0] for c in CODECS])
def test_garbage_never_raises(name, synth, parse):
    rng = random.Random(hash(name) & 0xFFFF)
    for _ in range(40):
        parse(bytes(rng.randrange(256) for _ in range(rng.randrange(300))))
