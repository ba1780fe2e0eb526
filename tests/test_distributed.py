"""Multi-host helpers: per-process file-list sharding."""

from cpc_audio_tpu.parallel.distributed import shard_sequences


def test_shard_sequences_disjoint_cover():
    seqs = [(i, f"f{i}.flac") for i in range(10)]
    shards = [shard_sequences(seqs, process_index=p, process_count=3)
              for p in range(3)]
    seen = [x for s in shards for x in s]
    assert sorted(seen) == sorted(seqs)          # full coverage
    flat = [tuple(x) for s in shards for x in s]
    assert len(set(flat)) == len(flat)           # disjoint


def test_shard_sequences_single_process_identity():
    seqs = [(0, "a"), (1, "b")]
    assert shard_sequences(seqs, process_index=0, process_count=1) == seqs
