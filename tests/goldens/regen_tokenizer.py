"""Regenerate the tokenizer golden fixture.

The real `bpe_simple_vocab_16e6.txt.gz` is not redistributable through this
offline environment, so the fixture commits (a) a *trained* mini-BPE merges
table — produced by the standard BPE training loop over a small English
corpus, giving realistic rank structure including `</w>` merges — and (b)
golden token-id sequences computed by **transformers' CLIPTokenizer** (the
HF port of the OpenAI tokenizer, an independent implementation) over the
repo's prompts plus adversarial cases.

`tests/test_tokenizer_golden.py` then checks our ClipTokenizer against the
committed ids AND live against HF. With the real vocab the only difference
is table contents, not algorithm — the algorithm is what these goldens pin.

Run:  python tests/goldens/regen_tokenizer.py
"""

import collections
import json
import os
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

TRAIN_CORPUS = """
a cartoon drawing of a girl walking through an enchanted forest with her
small white dog the wind moves the trees and the leaves fall slowly a man
rides a horse across the bridge into the sunset two children are playing
with a red ball near the river an anime character with long blue hair
turns around and smiles the camera pans over a quiet village at night
stars twinkle in the dark sky a wizard raises his staff and casts a
spell fire and smoke fill the air the dragon spreads its wings and flies
over the mountains waves crash against the rocky shore a sailing ship
drifts on calm water the robot walks through the neon city street rain
falls on the window while the cat sleeps on the sill
""".split()

ADVERSARIAL = [
    "a girl walking her dog",                      # plain
    "the WIND   moves\tthe\ntrees",                # case + whitespace
    "it's a dragon's breath, isn't it?",           # contractions
    "rocket launch in 3 2 1 go",                   # digits tokenize per-char
    "cafe vs café — déjà vu",  # accents + em dash
    "\U0001f3a8 painting \U0001f409!!",            # emoji (4-byte utf-8)
    "aaaaaa bbbbbb aabbaabb",                      # overlapping merge spans
    "walkingwalkingwalking",                       # long compound
    "",                                            # empty
    " edge  spaces ",                              # strip behavior
    ("a very long prompt that keeps going " * 20).strip(),   # >77 tokens
]


def train_bpe(corpus, n_merges=300):
    """Classic BPE training: repeatedly merge the most frequent pair.
    Words are character sequences with </w> on the final character,
    exactly the CLIP/GPT-2 word representation."""
    words = collections.Counter(
        tuple(w[:-1]) + (w[-1] + "</w>",) for w in corpus)
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, freq in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # deterministic tie-break: frequency, then lexicographic
        (a, b), freq = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        merges.append((a, b))
        merged = a + b
        new_words = {}
        for word, wfreq in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + wfreq
        words = new_words
    return merges


def build_vocab(merges):
    """Vocab in CLIP order: bytes, bytes</w>, merges, specials — ids line
    up 1:1 between our ClipTokenizer and HF's CLIPTokenizer."""
    from tooncrafter_tpu.utils.tokenizer import bytes_to_unicode

    vocab = list(bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    return vocab


def hf_tokenize(merges, vocab, texts, context_length=77):
    """Token ids from transformers' CLIPTokenizer over the same table."""
    from transformers.models.clip.tokenization_clip import CLIPTokenizer

    with tempfile.TemporaryDirectory() as td:
        vocab_file = os.path.join(td, "vocab.json")
        merges_file = os.path.join(td, "merges.txt")
        with open(vocab_file, "w") as f:
            json.dump({t: i for i, t in enumerate(vocab)}, f)
        with open(merges_file, "w") as f:
            f.write("#version: 0.2\n")
            for a, b in merges:
                f.write(f"{a} {b}\n")
        tok = CLIPTokenizer(vocab_file, merges_file)
        sot = tok.convert_tokens_to_ids("<|startoftext|>")
        eot = tok.convert_tokens_to_ids("<|endoftext|>")
        out = []
        for text in texts:
            ids = [sot] + tok.convert_tokens_to_ids(tok._tokenize(text)) \
                + [eot]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = eot
            out.append(ids + [0] * (context_length - len(ids)))
        return out


def main():
    merges = train_bpe(TRAIN_CORPUS)
    assert len(merges) >= 200, len(merges)
    with open(os.path.join(HERE, "clip_bpe_merges.txt"), "w") as f:
        # open_clip format: first line is a version banner, then merges
        f.write("bpe_simple_vocab mini fixture (trained; see regen)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")

    with open(os.path.join(REPO, "prompts", "512_interp",
                           "prompts.txt")) as f:
        prompts = [line.strip() for line in f if line.strip()]
    texts = prompts + ADVERSARIAL

    vocab = build_vocab(merges)
    ids = hf_tokenize(merges, vocab, texts)
    with open(os.path.join(HERE, "tokenizer_golden_ids.json"), "w") as f:
        json.dump({"texts": texts, "ids": ids,
                   "n_merges": len(merges)}, f, indent=1)
    print(f"wrote {len(merges)} merges, {len(texts)} golden sequences")


if __name__ == "__main__":
    main()
