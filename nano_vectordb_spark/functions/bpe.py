"""Byte-pair-encoding merge learning from a word-frequency table.

Tokenizer training is the canonical consumer of a cleaned corpus
(reference text pipeline analog: scripts/build_vecbin_chunked.py's
tokenize step consumes what this produces). The heavy part at 100 TB —
counting words — is distributed (explode -> map-side-combined hash
aggregate); the BPE loop itself runs driver-side over the BOUNDED
vocabulary head, the same train/assign split as the k-means fits
(functions/kmeans.py): real tokenizer trainers (the BPE of Sennrich et
al., ACL'16) also train from a word-frequency table, never by
re-scanning the corpus per merge.

Determinism contract (oracle-replayable): the vocabulary head is the
top-N words by (count desc, word asc); merge selection is (pair count
desc, pair lexicographic asc); merges apply greedily left-to-right.
Pure integer/string operations — no floats anywhere.
"""

from __future__ import annotations


def learn_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from (word, count) pairs.

    Returns (step, left, right, pair_count) per merge, step 1-based.
    Words segment into unicode characters (no end-of-word marker);
    every adjacent occurrence counts, weighted by word frequency.
    """
    segs: dict[str, tuple[str, ...]] = {w: tuple(w) for w, _ in word_counts}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts:
            s = segs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        left, right = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append((step, left, right, best_count))
        merged = left + right
        for w in segs:
            s = segs[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges


def segment_word(word: str, merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Apply learned merges in order to one word (the encode side)."""
    s: list[str] = list(word)
    for _, left, right, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


# Symbol separator for the JVM-native encode path: a control byte that
# cannot appear in whitespace-tokenized corpus words.
SEP = "\x01"


def merge_regex_steps(
    merges: list[tuple[int, str, str, int]]
) -> list[tuple[str, str]]:
    """Compile the merge list to (pattern, replacement) regex steps over
    a SEP-joined symbol string.

    Java's regexp_replace replaces non-overlapping matches left-to-right
    against the ORIGINAL string — exactly :func:`segment_word`'s greedy
    scan per merge (adjacency cases like 'aaa' with merge (a,a) agree;
    pinned by tests/test_bpe.py). The boundary lookarounds stop a merge
    from matching inside a longer symbol ('ab'+'c' never merges as
    b+c). Symbols are \\Q-quoted; replacements escape Matcher's \\ and $.
    """
    steps: list[tuple[str, str]] = []
    for _, left, right, _ in merges:
        if "\\E" in left + right:  # \Q-quoting cannot express \E itself
            raise ValueError("merge symbol contains the literal \\E")
        pat = f"(?<=^|{SEP})\\Q{left}\\E{SEP}\\Q{right}\\E(?={SEP}|$)"
        repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        steps.append((pat, repl))
    return steps
