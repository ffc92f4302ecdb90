"""Byte-level BPE text tokenizer (CLIP "simple" tokenizer vocabulary).

Behavioural parity with mmvid_pytorch/tokenizer.py:61-171 (itself the OpenAI
CLIP simple_tokenizer): byte->unicode table, greedy lowest-rank pair merging
over ``bpe_simple_vocab_16e6.txt`` merges, vocab of 49408
(256 bytes + 256 byte+'</w>' + 48894 merges + <|startoftext|>/<|endoftext|>),
``tokenize`` wraps with SOT/EOT and zero-pads to context_length.

Clean-room implementation of the standard algorithm; the vocabulary FILE is
shared data.  The reference's ftfy.fix_text is replaced by NFC
normalization + HTML unescaping (ftfy only repairs mojibake, which the
MMVID caption corpora do not contain).
"""

from __future__ import annotations

import html
import os
import unicodedata
from functools import lru_cache
from typing import List, Sequence, Union

import numpy as np
import regex as re

_DEFAULT_BPE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'data_files', 'bpe_simple_vocab_16e6.txt')

_WORD_RE = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE)


@lru_cache()
def byte_unicode_table():
    """Invertible byte -> printable-unicode map (standard GPT-2 table).

    Insertion order matters: vocab indices are assigned by iterating this
    dict, printable bytes first, then the remapped control bytes."""
    keep = (list(range(ord('!'), ord('~') + 1))
            + list(range(ord('¡'), ord('¬') + 1))
            + list(range(ord('®'), ord('ÿ') + 1)))
    table = {b: chr(b) for b in keep}
    extra = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + extra)
            extra += 1
    return table


def _clean(text: str) -> str:
    text = unicodedata.normalize('NFC', text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r'\s+', ' ', text)
    return text.strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str = _DEFAULT_BPE):
        self.byte_encoder = byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with open(bpe_path, encoding='utf8') as f:
            lines = f.read().split('\n')
        merges = [tuple(line.split()) for line in
                  lines[1:49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab += [v + '</w>' for v in vocab]
        vocab += [''.join(m) for m in merges]
        vocab += ['<|startoftext|>', '<|endoftext|>']
        self.vocab_size = 49408
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.rank = {m: i for i, m in enumerate(merges)}
        self._cache = {'<|startoftext|>': '<|startoftext|>',
                       '<|endoftext|>': '<|endoftext|>'}
        self.sot = self.encoder['<|startoftext|>']
        self.eot = self.encoder['<|endoftext|>']

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.rank.get(p, float('inf')))
            if best not in self.rank:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = ' '.join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        out = []
        for tok in re.findall(_WORD_RE, _clean(text).lower()):
            tok = ''.join(self.byte_encoder[b]
                          for b in tok.encode('utf-8'))
            out.extend(self.encoder[t] for t in self._bpe(tok).split(' '))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        ids = [int(i) for i in ids if int(i) not in (self.sot, self.eot, 0)]
        text = ''.join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode('utf-8', errors='replace').replace('</w>', ' ')

    def tokenize(self, texts: Union[str, Sequence[str]],
                 context_length: int = 256,
                 truncate_text: bool = False) -> np.ndarray:
        """-> int32 [N, context_length], zero-padded.  NB: unlike OpenAI
        CLIP, the MMVID tokenizer does NOT wrap with SOT/EOT
        (reference tokenizer.py:154-171)."""
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = self.encode(text)
            if len(ids) > context_length:
                if truncate_text:
                    ids = ids[:context_length]
                else:
                    raise RuntimeError(
                        f'Input {text!r} is too long for context length '
                        f'{context_length}')
            result[i, :len(ids)] = ids
        return result
