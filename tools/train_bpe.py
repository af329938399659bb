#!/usr/bin/env python3
"""Driver-side tooling (NOT part of the engine): train the committed BPE
merges fixture with the classic Sennrich et al. 2016 algorithm (public:
arXiv 1508.07909).

Phase 1 trains `n_merges` merges on the sf0.001 documents corpus (word
counts from the fixed seed-42 corpus; each round merges the most
frequent adjacent symbol pair, ties broken lexicographically).

Phase 2 (`--hex-extend M`) appends M merges trained on a SYNTHETIC
vocabulary — the md5 hex digest of each document, one occurrence each —
with phase-1 merges pre-applied and pair counts restricted to the hex
words. Why: the fixture corpus draws from a ~30-word vocabulary that
saturates at 109 organic merges (every word collapses to one symbol),
so a realistic-size merge table cannot be trained from it organically
without making corpus tokenization trivial. The hex extension scales
the APPLIED merge table (the per-word merge scan, the memoization, and
the oracle's CTE chain all walk every merge) while the corpus
vocabulary keeps its non-trivial subword splits. Hex merges are normal
merges: they fire on any hex-only symbol runs, including residues of
regular words, in both engines identically.

Determinism: corpus order and hashes are fixed; both phases use the
same count-then-lexicographic tie-break.

Output: one merge per line, left<TAB>right, in training (= application
priority) order, committed at src/main/resources/graft/bpe_merges.txt.

The committed fixture is `train_bpe.py 64 --hex-extend 704` (768 total
— the largest table the single-statement DuckDB oracle pattern admits
with headroom: the chained-CTE replay binds against DuckDB's
max_expression_depth of 1000 at ~900 chained merges, and the composed
pipe_corpus oracle wraps ~60 more CTEs around the chain).

Usage: python3 tools/train_bpe.py [n_merges] [--hex-extend M] > src/main/resources/graft/bpe_merges.txt
"""
import re, sys, collections, hashlib
import duckdb

args = [a for a in sys.argv[1:]]
N = int(args[0]) if args and not args[0].startswith("-") else 64
HEX = 0
if "--hex-extend" in args:
    if args.index("--hex-extend") + 1 >= len(args):
        sys.exit("usage: train_bpe.py [n_merges] [--hex-extend M] "
                 "(--hex-extend needs a value)")
    HEX = int(args[args.index("--hex-extend") + 1])
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


def train(seqs, counts, n):
    """Train up to n merges over `seqs` (word -> symbol tuple), weighting
    pairs by counts; mutates seqs in place, returns the merge list."""
    merges = []
    for _ in range(n):
        pairs = collections.Counter()
        for w, seq in seqs.items():
            c = counts[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        # ties: highest count, then lexicographically SMALLEST pair
        top = max(pairs.values())
        cand = sorted([p for p, c in pairs.items() if c == top])[0]
        merges.append(cand)
        apply_merge(seqs, cand)
    return merges


def apply_merge(seqs, pair):
    a, b = pair
    ab = a + b
    for w, seq in list(seqs.items()):
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(ab); i += 2
            else:
                out.append(seq[i]); i += 1
        seqs[w] = tuple(out)


# phase 1: organic corpus merges
seqs = {w: tuple([BOUND] + list(w)) for w in words}
merges = train(seqs, words, N)

# phase 2: hex-vocabulary extension (phase-1 merges pre-applied so the
# sequential application semantics are exact)
if HEX > 0:
    hex_words = collections.Counter(
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts)
    hseqs = {w: tuple([BOUND] + list(w)) for w in hex_words}
    for m in merges:
        apply_merge(hseqs, m)
    merges += train(hseqs, hex_words, HEX)

for a, b in merges:
    sys.stdout.write(f"{a}\t{b}\n")
