"""Injected neural sentence-embedding adapter (VERDICT r3 #4, X109's
swap point promoted to a supported API).

The reference's flagship ranking signal is a trained sentence encoder:
``ml-model/app.py:59-90`` loads all-MiniLM-L6-v2 and serves
``model.encode(texts) -> (n, 384) float32``, and the ingest pipeline
batches documents through it 32 at a time
(``data-pipeline/data_ingestion.py:179-218``, batch size via
``config.py:19``). This engine ships NO model weights (public-knowledge
rule) — instead this module adapts ANY ``texts -> vectors`` callable with
that exact shape into the engine's embedding lifecycle:

- :func:`make_encoder_embedding_udf` wraps the callable as an
  Arrow-batched pandas UDF over the raw TEXT column, pluggable into
  ``IndexBuilder.build_embeddings(embedder=..., embedder_source="text",
  embedder_tag=...)`` — layout, IVF indexing (``build_ann``), hybrid
  fusion and hydration are all unchanged downstream.
- :func:`encode_query` produces the query-side probe for
  ``QueryEngine.semantic_top_k_df(probe=...)`` /
  ``hybrid_top_k_df(probe=...)`` from the same callable.

Two injection forms, matching how real encoders deploy on a cluster:

- ``encoder=``: a PICKLABLE callable (ships with the task closure) —
  right for pure-function featurizers and test fakes.
- ``loader=``: a zero-arg factory called ONCE PER WORKER PROCESS and
  memoized (the load-model-per-executor pattern — a SentenceTransformer
  handle is not picklable and must not be re-loaded per batch):
  ``loader=lambda: SentenceTransformer("all-MiniLM-L6-v2").encode``.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

#: per-worker memo for ``loader=``-injected encoders (one load per
#: Python worker process, like the reference's module-level model).
#: Keyed by a uuid minted per ``make_encoder_embedding_udf`` call —
#: NOT by id(loader): CPython reuses freed addresses, so a long-lived
#: worker could otherwise serve a previous loader's model to a later
#: UDF with the same id (code-review r4).
_WORKER_ENCODERS: dict[str, Callable] = {}


def _resolve(encoder, loader, key: str):
    if encoder is not None:
        return encoder
    enc = _WORKER_ENCODERS.get(key)
    if enc is None:
        enc = loader()
        _WORKER_ENCODERS[key] = enc
    return enc


def _encode_batched(enc, texts: list[str], dim: int,
                    batch_size: int) -> list[np.ndarray]:
    """Run the encoder in reference-sized sub-batches and validate the
    contract: (n, dim) float-convertible output."""
    out: list[np.ndarray] = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i:i + batch_size]
        vecs = np.asarray(enc(chunk), dtype=np.float32)
        if vecs.shape != (len(chunk), dim):
            raise ValueError(
                f"injected encoder returned shape {vecs.shape} for "
                f"{len(chunk)} texts — expected ({len(chunk)}, {dim}); "
                "pass the dim the model actually produces")
        out.extend(vecs)
    return out


def make_encoder_embedding_udf(dim: int,
                               encoder: Callable | None = None,
                               loader: Callable[[], Callable] | None = None,
                               batch_size: int = 32):
    """``text -> array<float>`` pandas UDF around a ``model.encode``-shaped
    callable. Exactly one of ``encoder`` (picklable callable) / ``loader``
    (per-worker factory) must be given. NULL/empty text embeds to the zero
    vector — the same no-signal convention as the hashed featurizer
    (zero-norm rows are excluded by the query-side cosine guard)."""
    import uuid as _uuid

    if (encoder is None) == (loader is None):
        raise ValueError("pass exactly one of encoder= or loader=")
    # collision-free across UDF instances: rides the pickled closure, so
    # every task of THIS udf shares it and no other udf can alias it
    memo_key = _uuid.uuid4().hex

    @pandas_udf("array<float>")
    def encode_texts(text: pd.Series) -> pd.Series:
        enc = _resolve(encoder, loader, memo_key)
        zero = np.zeros(dim, dtype=np.float32)
        idx = [i for i, t in enumerate(text) if t]
        vecs = _encode_batched(enc, [text.iloc[i] for i in idx], dim,
                               batch_size)
        out = [zero] * len(text)
        for i, v in zip(idx, vecs):
            out[i] = v
        return pd.Series(out)

    return encode_texts


def encode_query(encoder: Callable, query: str, dim: int) -> list[float]:
    """Query-side probe from the same callable, for
    ``semantic_top_k_df(probe=...)``. The encoder output is rounded to
    float32 BEFORE widening to the float64 list (ADVICE r4: documented,
    deliberate) — document vectors are stored float32, so a float64
    encoder's probe is rounded identically to what the same text would
    store, keeping loader≡encoder and query-vs-stored cosines
    consistent."""
    vecs = np.asarray(encoder([query]), dtype=np.float32)
    if vecs.shape != (1, dim):
        raise ValueError(
            f"encoder returned shape {vecs.shape} for 1 text — "
            f"expected (1, {dim})")
    return [float(x) for x in vecs[0]]


def deterministic_fake_encoder(dim: int, seed: int = 7) -> Callable:
    """A weights-free stand-in with the ``model.encode`` shape, for tests
    and offline smoke runs: each text maps to a deterministic vector via
    seeded char-trigram feature hashing (every occurrence adds ±1 to one
    slot), L2-normalized like a sentence encoder's output. Similar texts
    share trigrams ⇒ higher cosine — enough structure to exercise
    ranking paths end-to-end without any model."""
    import hashlib

    def _vec(text: str) -> np.ndarray:
        v = np.zeros(dim, dtype=np.float64)
        s = f"\x00{text}\x00"
        for i in range(len(s) - 2):
            h = hashlib.blake2b(s[i:i + 3].encode("utf-8"),
                                digest_size=8,
                                key=seed.to_bytes(8, "little")).digest()
            n = int.from_bytes(h, "little")
            v[n % dim] += 1.0 if (n >> 32) & 1 else -1.0
        nrm = float(np.linalg.norm(v))
        return (v / nrm if nrm > 0 else v).astype(np.float32)

    def encode(texts: Iterable[str]) -> np.ndarray:
        return np.stack([_vec(t or "") for t in texts])

    return encode
