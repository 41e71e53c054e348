"""Pipeline configuration.

The reference exposes its knobs as CLI flags / compile-time constants
(K, L, W, R in hclust2.cpp:184-194; 512-dim/16-bit family in
pcluster.cpp:13-17 — see /root/reference).  Here the whole extension
surface is one dataclass passed to every stage; composition of stages
is plain Python over ``ray.data.Dataset`` (SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling (analog of k-mer window, kmer_search.cpp:68-81) ---
    shingle_k: int = 9          # k-char (byte) shingle window
    # --- MinHash signature (analog of the 8k-dim embedding, hclust.cpp:71-85) ---
    num_perms: int = 128        # signature width (bins for oph, perms for perms)
    # "oph": one-permutation hashing + densification — O(width·log n)/doc,
    #        the memory-bandwidth-friendly scheme (default).
    # "perms": classic independent multiply-shift permutations — O(width·n)/doc.
    minhash_scheme: str = "oph"
    # --- LSH banding (analog of K bits x L tables, lsh.hpp:51-59) ---
    num_bands: int = 16         # L tables
    rows_per_band: int = 8      # K concatenated hashes per table (16*8=128)
    # --- SimHash fingerprint (analog of the 512-dim frequency vector
    #     + cosine-LSH bits, pcluster/lsh.cpp:40-49) ---
    simhash_bits: int = 64
    simhash_hamming_max: int = 3   # chunk-blocking verify bound (simhash_dup_pairs)
    # Cheap precision lever (wired in Verifier.__call__, stages/verify.py):
    # with ``use_sketch_prefilter`` on, candidate pairs whose 64-bit
    # stored-shingle sketches (LSB of each of 64 OPH minhash bins — 1-bit
    # b-bit minwise hashing, Li & König, WWW 2010) differ by more than
    # ``prefilter_hamming`` bits skip exact Jaccard entirely — the
    # reference's cheap-then-exact two-tier verify (pcluster.cpp:34 ->
    # hash_search.cpp:593-599).  Two docs with Jaccard J agree per bit
    # with prob (1+J)/2, so hamming ~ Binomial(64, (1-J)/2): at the
    # default threshold 0.7 the mean is ~9.6 and 16 is ~+2.5σ.  Lossy;
    # off by default for recall.  (A SimHash sketch was measured 180x
    # more expensive to precompute — bit-unpack votes are 4.5 µs/shingle
    # vs 25 ns for the OPH kernel the signer already uses.)
    use_sketch_prefilter: bool = False
    prefilter_hamming: int = 16
    # --- verification (analog of exact distance <= R, kmer_search.cpp:107-111) ---
    jaccard_threshold: float = 0.7
    # --- containment / fingerprint pass (analog of the suffix-array shared-substring
    #     pass, IGC/shuffle_data/IGC/suffix_array.cpp + gen_kmers_from_suffix_array.cpp) ---
    winnow_window: int = 16        # winnowing window (fingerprints = window minima)
    containment_min_common: int = 3  # shared fingerprints to become a candidate pair
    containment_threshold: float = 0.5  # |A ∩ B| / min(|A|,|B|) over shingle sets
    # --- skew handling (the reference's unhandled weak point, pcluster.cpp:37-66) ---
    max_bucket_pairs_exhaustive: int = 64   # buckets up to this size emit all pairs
    # Larger (hub-starred) buckets additionally emit a ring-window recovery
    # pass (wired in lsh._emit_bucket_runs): members sorted by simhash when
    # the banded rows carry one (sign(..., with_simhash=True)), else by
    # file id; each member pairs with its `window` ring successors.  0
    # disables recovery (star edges only).
    hot_bucket_window: int = 4
    # --- disk-staged candidate exchange (the 61M-file envelope lever):
    #     when > 1, the banded postings land ONCE in parquet partitioned
    #     by the top bits of the bucket key, and each key range runs its
    #     sort + run scan separately, so the object store holds only
    #     1/ranges of the exchange at a time (the spill non-convergence
    #     post-mortem in BASELINE.md: the in-flight gkey sort is the
    #     binding per-node term).  Rounded up to a power of two.  0/1 =
    #     the ordinary single-pass in-store exchange. ---
    exchange_stage_ranges: int = 0
    exchange_stage_dir: str = "/tmp/hsearch_ray_stage"
    # --- similarity-space normalization (M6 analog: compressed-alphabet
    #     encode, pcluster/src/pcluster/hash_search.cpp:34-75 murphy10 —
    #     matching robust to symbol-level churn).  For code, the churn is
    #     whitespace/identifier noise: when enabled, shingling sees
    #     whitespace runs collapsed to one space and identifier tokens
    #     canonicalized to a fixed symbol, so rename-only clones match.
    #     sha256 / exact dedup ALWAYS stays on raw bytes. ---
    token_canonicalize: bool = False
    # --- borderline edit-similarity verify (F12/F13 analog: seed-extend
    #     alignment, hash_search.cpp:661-948).  Pairs whose exact Jaccard
    #     lands in [thr - edit_band, thr) get a token-LCS similarity
    #     check; >= edit_sim_threshold admits them as method="edit". ---
    edit_verify: bool = False
    edit_band: float = 0.1
    edit_sim_threshold: float = 0.8
    # --- determinism ---
    seed: int = 42
    # --- execution sizing ---
    sign_batch_size: int = 512      # rows per Signer batch (content can be tens of KB/row)
    verify_batch_size: int = 4096   # candidate pairs per Verifier batch
    # --- verify store residency (scale lever; results unaffected) ---
    # Max shingle-store shards one verify worker keeps mapped at a time.
    # Zero-copy views PIN their plasma objects: with no bound, every
    # worker eventually maps every shard and the whole store becomes
    # unevictable — at 30.72M files that forced raising the object-store
    # share past the raylet spill-crash envelope (BASELINE.md round 4).
    # A bounded LRU keeps only the recently-touched shards pinned; 0
    # restores the unbounded map.
    verify_shard_cache: int = 12
    # Reorder candidate pairs block-locally by (shard(a), shard(b))
    # before verify, so consecutive batches sweep shards in order and
    # the LRU hits.  Pairs arrive a-sorted (distinct_pairs), so this is
    # one in-block lexsort — no shuffle.  None = auto: on when the
    # candidate-id count reaches ``shard_coherent_above`` (the store is
    # then large enough that residency matters); True/False force it.
    shard_coherent_verify: bool | None = None
    shard_coherent_above: int = 2_000_000
    # actor-pool sizing: min=1 so small clusters (tests at num_cpus=4) never
    # deadlock on pool preallocation; max bounds come from the session size
    sign_concurrency: tuple[int, int] = (1, 32)  # Signer actor pool min/max
    verify_concurrency: tuple[int, int] = (1, 32)
    # --- filters (M10 analog: min-length filter, pcluster.cpp:23-25) ---
    min_content_len: int = 1       # drop empty files from similarity (kept in exact dedup)
    max_content_len: int = 8 << 20  # drop pathological rows from the similarity path

    def __post_init__(self) -> None:
        if self.num_bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"num_bands*rows_per_band must equal num_perms "
                f"({self.num_bands}*{self.rows_per_band} != {self.num_perms})"
            )


DEFAULT_CONFIG = PipelineConfig()
