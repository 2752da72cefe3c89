from psg_tpu.text.bpe import ClipBPETokenizer
from psg_tpu.text.tokenizer import WordPieceTokenizer, build_vocab_from_corpus

__all__ = ["WordPieceTokenizer", "build_vocab_from_corpus", "ClipBPETokenizer"]
