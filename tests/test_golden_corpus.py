"""Golden regression anchor: the canonical corpus (n=500, seed-fixed) must
reproduce byte-for-byte across rounds and machines — the engine's analog of
the reference's checked-in data/distinct golden output. If datagen ever
drifts (numpy RNG change, codec tweak), this fails before the suite's
oracle silently shifts."""

from __future__ import annotations

import hashlib
import json
import os

from schema_inference_spark.datagen.images import generate_image_corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "corpus_500_expected.json")


def test_corpus_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)
    c = generate_image_corpus(golden["n"], n_parts=golden["n_parts"])
    assert len(c.captions) == golden["n_captions"]
    assert c.expected == golden["expected"]
    assert c.images.image_id.iloc[:3].tolist() == golden["image_id_sample"]
    assert [int(x) for x in c.images.phash.iloc[:3]] == golden["phash_sample"]
    got_md5 = hashlib.md5(b"".join(c.images.bytes.iloc[:10])).hexdigest()
    assert got_md5 == golden["bytes_md5_sample"]
