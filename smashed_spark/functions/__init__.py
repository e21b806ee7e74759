from .dedup import (
    EmbeddingNearDupPairsMapper,
    ExactDedupMapper,
    MinHashLSHPairsMapper,
    MinHashMapper,
    NGramJaccardPairsMapper,
    SemanticNearDupPairsMapper,
    SimHashMapper,
    SimHashNearDupPairsMapper,
    dedup_incremental,
    dedup_incremental_fuzzy,
    dedup_incremental_semantic,
    dedup_report,
    fuzzy_dedup,
    semantic_dedup,
    with_digests,
    with_minhash_bands,
    with_semantic_cells,
)
from .hashing import (
    cosine_similarity,
    minhash_signature,
    portable_hash32,
    portable_hash60,
    simhash,
    word_shingles,
)
from .asof import AsofJoinMapper, RangeJoinMapper, asof_join
from .bpe import BpeTokenCountMapper, bpe_encode_word, fit_bpe_merges
from .calibrate import calibrate_thresholds, select_top_fraction
from .classifier import (
    LinearQualityClassifierMapper,
    UnigramLogProbMapper,
    fit_quality_classifier,
    fit_unigram_logprob_table,
)
from .similarity import (
    CosineTopK,
    HyperplaneLSHTopK,
    IVFCosineTopK,
    fit_ivf_index,
)
from .textstats import (
    CompressionRatioMapper,
    DecontaminateMapper,
    SemanticDecontaminateMapper,
    FingerprintMapper,
    LangIdMapper,
    PiiRedactMapper,
    QualityScoreMapper,
    RepetitionStatsMapper,
    TokenCountMapper,
)
from .web import DomainFilterMapper, UrlHostMapper
from .wordpiece import WordPieceTokenizer, tiny_bert_tokenizer

from .graph import DedupClustersMapper, connected_components
from .packing import (
    BinPackSequencesMapper,
    PackSequencesMapper,
    with_prefix_sum,
)
from .profile import profile_corpus
from .selection import dsir_select, gumbel_top_k, with_importance_logweight
from .sessions import SessionizeMapper, SessionStatsMapper
from .sketches import KMVSketch, distinct_estimate, kmv_sketch
from .substring import (
    DedupParagraphsMapper,
    DuplicatedSpansMapper,
    DuplicatedWindowsMapper,
)

__all__ = [
    "AsofJoinMapper",
    "BinPackSequencesMapper",
    "DedupClustersMapper",
    "LinearQualityClassifierMapper",
    "SemanticNearDupPairsMapper",
    "UnigramLogProbMapper",
    "dedup_incremental",
    "fit_quality_classifier",
    "fit_unigram_logprob_table",
    "dedup_incremental_fuzzy",
    "dedup_incremental_semantic",
    "dedup_report",
    "fit_ivf_index",
    "fuzzy_dedup",
    "semantic_dedup",
    "with_digests",
    "with_minhash_bands",
    "with_semantic_cells",
    "DedupParagraphsMapper",
    "DuplicatedSpansMapper",
    "DuplicatedWindowsMapper",
    "KMVSketch",
    "PackSequencesMapper",
    "SessionStatsMapper",
    "SessionizeMapper",
    "connected_components",
    "distinct_estimate",
    "dsir_select",
    "gumbel_top_k",
    "with_importance_logweight",
    "kmv_sketch",
    "portable_hash60",
    "profile_corpus",
    "with_prefix_sum",
    "CompressionRatioMapper",
    "CosineTopK",
    "DecontaminateMapper",
    "DomainFilterMapper",
    "UrlHostMapper",
    "SemanticDecontaminateMapper",
    "EmbeddingNearDupPairsMapper",
    "ExactDedupMapper",
    "FingerprintMapper",
    "HyperplaneLSHTopK",
    "IVFCosineTopK",
    "LangIdMapper",
    "MinHashLSHPairsMapper",
    "MinHashMapper",
    "NGramJaccardPairsMapper",
    "PiiRedactMapper",
    "QualityScoreMapper",
    "RepetitionStatsMapper",
    "SimHashMapper",
    "RangeJoinMapper",
    "SimHashNearDupPairsMapper",
    "TokenCountMapper",
    "WordPieceTokenizer",
    "asof_join",
    "BpeTokenCountMapper",
    "bpe_encode_word",
    "fit_bpe_merges",
    "calibrate_thresholds",
    "select_top_fraction",
    "cosine_similarity",
    "minhash_signature",
    "portable_hash32",
    "simhash",
    "tiny_bert_tokenizer",
    "word_shingles",
]

