"""Vocabulary + caption tokenization.

Equivalent of ``utils/build_vocab.py``: word↔index maps with the fixed token
protocol ``<pad>=0, <start>=1, <end>=2, <unk>=3`` (build_vocab.py:100-103),
built from a Clotho-style ``text.json`` (``{"audios": [{"audio_id", "captions":
[{"caption"|"tokens", "cap_id"}]}]}``) with lowercasing, punctuation stripping
and a min-count threshold (build_vocab.py:60-95).  Plain-Python host-side code
(vocab building is a one-off preprocessing step).
"""
from __future__ import annotations

import json
import pickle
import re
from collections import Counter
from typing import Dict, Iterable, List

from acvae_tpu import END_IDX, PAD_IDX, START_IDX, UNK_IDX

# the reference's exact set (build_vocab.py:80), replaced by a SPACE so
# punctuation-joined words split into separate tokens ("(loudly),then" ->
# ["loudly", "then"], not "(loudly)then")
_PUNCT = re.compile(r"[,.():;?!\"']")
_TP_PAD_RE = re.compile(r"<pad_\d+>")


def tokenize(caption: str, zh: bool = False) -> List[str]:
    """Lowercase + strip punctuation + whitespace split (build_vocab.py:74-78).

    ``zh=True``: character-level CJK tokenization — the reference's Chinese
    path segments words through a CoreNLP server (build_vocab.py:106-118),
    which isn't available offline; character tokens are the standard
    server-free fallback (documented divergence).  Latin spans inside the
    text stay whole words."""
    if not zh:
        # sub with a space + split() == the reference's space-replace and
        # " +" collapse (build_vocab.py:86-88)
        return _PUNCT.sub(" ", caption.lower()).split()
    out: List[str] = []
    word = ""
    for ch in caption.lower():
        if "一" <= ch <= "鿿":
            if word:
                out.append(word)
                word = ""
            out.append(ch)
        elif (ch.isspace() or _PUNCT.match(ch)
              or "　" <= ch <= "〿"      # CJK punctuation （、。）
              or "＀" <= ch <= "￯"):    # fullwidth forms （，！？）
            if word:
                out.append(word)
                word = ""
        else:
            word += ch
    if word:
        out.append(word)
    return out


class Vocabulary:
    """word2idx/idx2word with ``<unk>`` fallback (build_vocab.py:9-28)."""

    def __init__(self):
        self.word2idx: Dict[str, int] = {}
        self.idx2word: Dict[int, str] = {}
        for tok in ("<pad>", "<start>", "<end>", "<unk>"):
            self.add_word(tok)
        assert self.word2idx["<pad>"] == PAD_IDX
        assert self.word2idx["<start>"] == START_IDX
        assert self.word2idx["<end>"] == END_IDX
        assert self.word2idx["<unk>"] == UNK_IDX

    def add_word(self, word: str) -> int:
        if word not in self.word2idx:
            idx = len(self.word2idx)
            self.word2idx[word] = idx
            self.idx2word[idx] = word
        return self.word2idx[word]

    def __call__(self, word: str) -> int:
        return self.word2idx.get(word, self.word2idx["<unk>"])

    def __len__(self) -> int:
        return len(self.word2idx)

    def decode(self, ids: Iterable[int]) -> List[str]:
        """ids → words, skipping <start>, stopping at <end>
        (utils/score_util.py:33-41).  Inert TP-padding tokens (``<pad_k>``
        from ``build_vocab --pad_to_multiple``) are skipped too — they are
        never data, so an early-training model that momentarily ranks one
        high must not leak a literal ``<pad_3>`` into a caption."""
        words = []
        for i in ids:
            i = int(i)
            if i == START_IDX:
                continue
            if i == END_IDX:
                break
            w = self.idx2word.get(i, "<unk>")
            if _TP_PAD_RE.fullmatch(w):
                continue
            words.append(w)
        return words

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"word2idx": self.word2idx}, f)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        """Load a vocab pickle: ours ({"word2idx": ...} or a pickled
        Vocabulary), or an UPSTREAM ``vocab.pkl`` — the reference pickles
        its ``utils.build_vocab.Vocabulary`` *instance*
        (build_vocab.py:9-28,100-107), whose module path does not exist
        here; a lenient unpickler maps any class named ``Vocabulary`` to an
        attribute shell and the mapping is rebuilt from its ``word2idx``.
        The reference adds the four specials first in our exact order
        (build_vocab.py:100-103); a foreign vocab that deviates is rejected
        rather than silently re-indexed."""
        with open(path, "rb") as f:
            obj = _LenientVocabUnpickler(f).load()
        if isinstance(obj, cls):          # pickled Vocabulary (ours)
            return obj
        mapping = (obj.get("word2idx") if isinstance(obj, dict)
                   else getattr(obj, "word2idx", None))
        if not isinstance(mapping, dict):
            raise ValueError(
                f"{path}: unrecognized vocab pickle (no word2idx mapping)")
        for tok, want in (("<pad>", PAD_IDX), ("<start>", START_IDX),
                          ("<end>", END_IDX), ("<unk>", UNK_IDX)):
            if mapping.get(tok) != want:
                raise ValueError(
                    f"{path}: special token {tok!r} is at index "
                    f"{mapping.get(tok)!r}, expected {want} — this vocab "
                    f"was not built with the AudioCaption special-token "
                    f"order and cannot be used directly; rebuild with "
                    f"`cli build_vocab`")
        vocab = cls()
        for word, idx in sorted(mapping.items(), key=lambda kv: kv[1]):
            vocab.add_word(word)
        return vocab


class _VocabShell:
    """Attribute sink for foreign pickled Vocabulary instances."""


#: Globals a vocab pickle may legitimately reference beyond the
#: Vocabulary class itself: plain containers only.  Anything else is a
#: code-execution vector (upstream vocab.pkl files are untrusted input),
#: so the unpickler rejects it rather than importing it.
_SAFE_GLOBALS = {
    ("builtins", "dict"), ("builtins", "list"), ("builtins", "set"),
    ("builtins", "frozenset"), ("builtins", "tuple"),
    ("collections", "OrderedDict"),
}


class _LenientVocabUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "Vocabulary":
            # Unconditionally shell-out — never import the pickle's own
            # module path, even if it happens to resolve here.  load()
            # rebuilds from the shell's word2idx either way.
            return _VocabShell
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"vocab pickle references disallowed global {module}.{name}; "
            f"only plain containers and a Vocabulary class are accepted")


def build_vocab(caption_info: List[dict], threshold: int = 1,
                zh: bool = False, pad_to_multiple: int = 1) -> Vocabulary:
    """Build from text.json 'audios' list; writes `tokens` back into each
    caption dict like the reference does (build_vocab.py:95).

    ``pad_to_multiple``: round the vocab size up with inert ``<pad_k>``
    tokens — required by ``model_parallel: M`` training, where the explicit
    placement of vocab-sharded parameters needs M to divide |V| (the
    standard pad-the-tokenizer recipe).  The pads never appear in data, so
    they behave like any never-observed vocabulary entry: never a CE
    target, logits pushed down through the softmax normalizer every step
    (the run is not bitwise-identical to an unpadded-vocab run — the
    normalizer sums over |V| classes — it is *equivalent* the way a vocab
    with extra singleton words is), and :meth:`Vocabulary.decode` skips
    them so they can never appear in generated captions."""
    counter: Counter = Counter()
    for audio in caption_info:
        for cap in audio["captions"]:
            tokens = cap.get("tokens")
            tokens = tokens.split() if tokens else tokenize(cap["caption"], zh)
            cap["tokens"] = " ".join(tokens)
            counter.update(tokens)
    vocab = Vocabulary()
    for word, cnt in sorted(counter.items()):
        if cnt >= threshold:
            vocab.add_word(word)
    k = 0
    while len(vocab) % max(1, pad_to_multiple):
        vocab.add_word(f"<pad_{k}>")
        k += 1
    return vocab


def load_caption_info(caption_file: str, zh: bool = False) -> List[dict]:
    """Load a text.json "audios" list.  Captions lacking ``tokens`` (raw
    external caption files) get them synthesized with :func:`tokenize` — the
    PTB-tokenizer stand-in the reference applies to all text before scoring
    (base_runner.py:163-196), so raw and pre-tokenized files behave
    identically downstream."""
    with open(caption_file) as f:
        info = json.load(f)["audios"]
    for a in info:
        for c in a.get("captions", []):
            if "tokens" not in c and "caption" in c:
                c["tokens"] = " ".join(tokenize(c["caption"], zh))
    return info
