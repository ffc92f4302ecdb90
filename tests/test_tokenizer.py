"""BPE tokenizer parity vs the reference CLIP simple tokenizer."""

import sys
import types

import numpy as np
import pytest

from mmvid_tpu.tokenizer import SimpleTokenizer

from oracles import install_reference

pytestmark = pytest.mark.quick

CAPTIONS = [
    "A person with appearance in image one and mask in image two is talking.",
    "the woman has wavy hair and wears lipstick, she is smiling",
    "He's got a 5 o'clock shadow & bushy eyebrows!",
    "slow speed.",
    "",
]


@pytest.fixture(scope='module')
def ref_tokenizer():
    install_reference()
    if 'ftfy' not in sys.modules:
        ftfy = types.ModuleType('ftfy')
        ftfy.fix_text = lambda s: s  # captions here are plain ASCII
        sys.modules['ftfy'] = ftfy
    from mmvid_pytorch.tokenizer import SimpleTokenizer as RefTok
    return RefTok()


def test_vocab_matches(ref_tokenizer):
    tok = SimpleTokenizer()
    assert tok.vocab_size == ref_tokenizer.vocab_size == 49408
    assert tok.encoder == ref_tokenizer.encoder


def test_encode_parity(ref_tokenizer):
    tok = SimpleTokenizer()
    for cap in CAPTIONS:
        assert tok.encode(cap) == ref_tokenizer.encode(cap), cap


def test_tokenize_parity(ref_tokenizer):
    tok = SimpleTokenizer()
    ours = tok.tokenize(CAPTIONS, context_length=50, truncate_text=True)
    theirs = ref_tokenizer.tokenize(CAPTIONS, context_length=50,
                                    truncate_text=True).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_decode_roundtrip():
    tok = SimpleTokenizer()
    text = "a person is talking"
    ids = tok.tokenize(text, context_length=20)[0]
    assert tok.decode(ids).strip() == text


def test_too_long_raises():
    tok = SimpleTokenizer()
    with pytest.raises(RuntimeError):
        tok.tokenize('word ' * 100, context_length=10, truncate_text=False)
