"""Engine configuration.

The reference keeps its tunables in ``data-pipeline/config.py`` (embedding
batch size 32 at :19, max_records 50000 at :26) and DDL-time index params
(``data-pipeline/database.py:47-54``: ivfflat lists=100). Ours are the BM25
and physical-layout knobs for the inverted index.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 (Robertson / Lucene form, SURVEY.md §2.2 E14) ---
    k1: float = 1.2
    b: float = 0.75

    # --- tokenization ---
    min_token_len: int = 1
    max_token_len: int = 64  # guard against pathological unbroken runs
    # Named analyzer applied to the token stream at build AND query time.
    # "simple" (default): raw lowercase alnum tokens — Postgres's `simple`
    # config, bit-identical to the pre-analyzer engine. "english": Snowball
    # stopword removal + Porter stemming (functions/stem.py) — the
    # normalization inside the reference's actual index DDL,
    # to_tsvector('english', ...) at data-pipeline/database.py:60.
    # "unaccent": diacritics folded to ASCII BEFORE tokenization
    # (Postgres unaccent + simple chain; Lucene ASCIIFoldingFilter).
    # "english_unaccent": unaccent → stopwords → stem (the chained
    # unaccent+english config). Part of the fingerprint: changing it
    # changes every index artifact.
    analyzer: str = "simple"

    # --- document resolution ---
    # When the `text` column is non-NULL, trust it; otherwise extract from
    # `html`. (FIXTURES.md §1: 90% of rows need extraction.)
    prefer_provided_text: bool = True

    # --- physical layout ---
    # doc-id space: 60-bit hash of url (15 hex chars of sha256) — stable
    # across runs and parallelism levels (SURVEY.md §7.4).
    doc_id_bits: int = 60
    # number of doc-range buckets ("partition_id"): posting lists are built
    # per (term, bucket) so no single shuffle group exceeds ~corpus/P docs —
    # this is the explicit head-term skew handling (north_rule). At 10^12
    # docs set P so that docs/P ~ 10^7.
    n_doc_buckets: int = 32
    # Physically partition the doc_features table by partition_id so the
    # incremental-ingest scan prunes to touched buckets (docs/SCALE.md
    # "honest accounting"). Off by default: at sandbox scale the P extra
    # directories cost more than the pruning saves, and every MERGE
    # commit must re-impose the layout; turn on for large corpora with
    # frequent incremental crawls.
    partition_doc_features: bool = False
    # postings per compressed block (block-max WAND granularity)
    block_size: int = 128
    # number of term hash-buckets used to partition the postings and
    # term_stats tables so query-time `term IN (...)` scans prune files.
    #
    # NOTE on skew strategy: head-term salting is by *doc-range bucket*
    # (partition_id), applied to every term rather than df-gated. A
    # df-threshold salt would put tail terms and head terms in different
    # bucket spaces, and per-bucket WAND requires each bucket to be a
    # doc-disjoint slice of ALL query terms' postings — a doc-keyed salt is
    # the only shape that serves both the build (bounded shuffle groups)
    # and the query (independent per-bucket top-k).
    n_term_buckets: int = 32

    # champion-list length (impact-ordered fancy lists, plans/champions.py):
    # per term, the m postings with the highest tf/(tf+K(dl)) kept in the
    # opt-in `champions` side table (build_champions). Sized so that
    # m >= max_k + max_offset covers every exact-bootstrap page depth;
    # the table is ~m x |dictionary| rows — negligible next to postings.
    champions_m: int = 128

    # --- content dedup at ingest (build-time corpus hygiene) ---
    # "none" (default): index every unique-url document (per-url recrawl
    # resolution always applies). "exact": drop content-identical bodies
    # across DIFFERENT urls (mirror sites, tracking-parameter aliases) —
    # keyed on the already-computed extracted_sha256, so it costs one
    # slim groupBy, no re-reading of text. "near": exact first, then
    # MinHash-LSH near-duplicate clustering (operators/dedup.py) over the
    # exact survivors — the CCNet/RefinedWeb-style boilerplate/recrawl
    # collapse. Survivor = minimum doc_id of each cluster (deterministic,
    # parallelism-independent). All dedup_* fields are content-affecting
    # and therefore part of the fingerprint; extraction is staged so a
    # dedup re-tune never re-runs the extract UDF (doc_features_raw is
    # resume-shared).
    dedup: str = "none"
    dedup_shingle_size: int = 3
    dedup_n_hashes: int = 8
    dedup_bands: int = 4
    dedup_threshold: float = 0.7

    # --- query-time ---
    default_k: int = 10
    max_k: int = 100          # mirror of SearchRequest limit cap 1..100
    max_offset: int = 10_000  # deep-pagination guard (SURVEY.md §7.4)
    default_min_score: float = 0.0

    # --- shuffle sizing ---
    shuffle_partitions: int = 32

    # Concurrency cap for the Arrow/pandas-UDF stages (extract/tokenize
    # and the posting-block encoder): when set, those stages repartition
    # to THIS width instead of ``shuffle_partitions``, bounding the number
    # of simultaneously busy Python worker processes. None (default)
    # inherits the stage's natural width — correct on a real cluster,
    # where each executor hosts only a few Python workers. Set it on
    # hosts whose kernel degrades under many concurrent processes (the
    # round-3 sandbox VM loses throughput *superlinearly* beyond ~8 busy
    # Python workers — see BENCH.md "host regime"); purely physical, so
    # it is excluded from the checkpoint fingerprint (outputs are
    # bit-identical at any width: posting groups are keyed by
    # (term, partition_id), never by the shuffle width).
    python_stage_parallelism: int | None = None

    def fingerprint(self) -> str:
        """Stable hash of the config — part of each stage's checkpoint key.

        ``python_stage_parallelism`` is excluded: it changes only the
        physical width of the UDF stages, never their output, so toggling
        it must not invalidate committed snapshots."""
        d = asdict(self)
        d.pop("python_stage_parallelism", None)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def fingerprint_no_dedup(self) -> str:
        """Fingerprint with the dedup_* knobs masked to their defaults —
        the checkpoint key of the doc_features_raw stage, whose output
        (pure extraction) is dedup-independent. Re-tuning dedup therefore
        re-runs only the ledger + survivor filter, never the extract UDF."""
        masked = dict(dedup="none", dedup_shingle_size=3, dedup_n_hashes=8,
                      dedup_bands=4, dedup_threshold=0.7)
        d = asdict(self)
        d.pop("python_stage_parallelism", None)
        d.update(masked)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = EngineConfig()
