#!/usr/bin/env python3
"""Driver-side tooling (NOT part of the engine): train the committed BPE
merges fixture from the sf0.001 documents corpus with the classic
Sennrich et al. 2016 algorithm (public: arXiv 1508.07909).

Determinism: word counts from the fixed seed-42 corpus; each round
merges the most frequent adjacent symbol pair, ties broken
lexicographically. Output: one merge per line, left<TAB>right, in
training (= application priority) order, committed at
src/main/resources/graft/bpe_merges.txt.

Usage: python3 tools/train_bpe.py [n_merges] > src/main/resources/graft/bpe_merges.txt
"""
import re, sys, collections
import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
BOUND = "▁"  # SentencePiece-style word-boundary symbol

texts = [r[0] for r in duckdb.sql(
    "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'").fetchall()]

# the engine's normalization: lowercase, strip the two reserved chars,
# collapse whitespace; every word gets a leading boundary symbol
words = collections.Counter()
for t in texts:
    t = t.lower().replace("␟", "").replace(BOUND, "")
    for w in re.split(r"\s+", t.strip()):
        if w:
            words[w] += 1

# symbol sequences: boundary symbol is its own initial symbol
seqs = {w: tuple([BOUND] + list(w)) for w in words}

merges = []
for _ in range(N):
    pairs = collections.Counter()
    for w, seq in seqs.items():
        c = words[w]
        for i in range(len(seq) - 1):
            pairs[(seq[i], seq[i + 1])] += c
    if not pairs:
        break
    # ties: highest count, then lexicographically SMALLEST pair
    top = max(pairs.values())
    cand = sorted([p for p, c in pairs.items() if c == top])[0]
    merges.append(cand)
    a, b = cand
    ab = a + b
    new_seqs = {}
    for w, seq in seqs.items():
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(ab); i += 2
            else:
                out.append(seq[i]); i += 1
        new_seqs[w] = tuple(out)
    seqs = new_seqs

for a, b in merges:
    sys.stdout.write(f"{a}\t{b}\n")
