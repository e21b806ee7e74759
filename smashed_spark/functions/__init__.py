from .dedup import (
    EmbeddingNearDupPairsMapper,
    ExactDedupMapper,
    MinHashLSHPairsMapper,
    MinHashMapper,
    NGramJaccardPairsMapper,
    SimHashMapper,
)
from .hashing import (
    cosine_similarity,
    minhash_signature,
    portable_hash32,
    simhash,
    word_shingles,
)
from .similarity import CosineTopK, HyperplaneLSHTopK
from .textstats import (
    FingerprintMapper,
    LangIdMapper,
    QualityScoreMapper,
    TokenCountMapper,
)
from .wordpiece import WordPieceTokenizer, tiny_bert_tokenizer

__all__ = [
    "CosineTopK",
    "EmbeddingNearDupPairsMapper",
    "ExactDedupMapper",
    "FingerprintMapper",
    "HyperplaneLSHTopK",
    "LangIdMapper",
    "MinHashLSHPairsMapper",
    "MinHashMapper",
    "NGramJaccardPairsMapper",
    "QualityScoreMapper",
    "SimHashMapper",
    "TokenCountMapper",
    "WordPieceTokenizer",
    "cosine_similarity",
    "minhash_signature",
    "portable_hash32",
    "simhash",
    "tiny_bert_tokenizer",
    "word_shingles",
]
