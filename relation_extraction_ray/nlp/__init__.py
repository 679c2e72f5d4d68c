from .parser import Sentence, parse_sentence, split_sentences, noun_chunk_spans
from .sdp import (
    SPECIALS,
    dependency_path_to_root,
    find_common_ancestor,
    finalize_vocab,
    is_ok_sdp,
    post_process_path,
    sentence_to_sdps,
    smart_token_text,
    vocab2idx,
)

__all__ = [
    "Sentence",
    "parse_sentence",
    "split_sentences",
    "noun_chunk_spans",
    "SPECIALS",
    "dependency_path_to_root",
    "find_common_ancestor",
    "finalize_vocab",
    "is_ok_sdp",
    "post_process_path",
    "sentence_to_sdps",
    "smart_token_text",
    "vocab2idx",
]
