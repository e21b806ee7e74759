from .batchers import FixedBatchSizeMapper
from .debug import MockMapper
from .fields import (
    ChangeFieldsMapper,
    EnumerateFieldMapper,
    MakeFieldMapper,
    RenameFieldsMapper,
)
from .filters import FilterMapper
from .glom import GlomMapper
from .masks import (
    IndicesToMaskMapper,
    MaskToIndicesMapper,
    MaskToRangeMapper,
    RangeToMaskMapper,
)
from .multiseq import (
    AttentionMaskSequencePaddingMapper,
    LabelsMaskerMapper,
    MakeAttentionMaskMapper,
    MultiSequenceStriderMapper,
    SequencesConcatenateMapper,
    SingleValueToSequenceMapper,
    TokensSequencesPaddingMapper,
    TokenTypeIdsSequencePaddingMapper,
)
from .prompting import (
    FillEncodedPromptMapper,
    FillTextPromptMapper,
    TruncateMultipleFieldsMapper,
    TruncateMultipleNestedFieldsMapper,
)
from .shape import (
    FlattenMapper,
    SingleSequenceStriderMapper,
    SingleSequenceStriderMapperWithLocations,
    UnpackingMapper,
)
from .text import FtfyMapper, TextToWordsMapper, WordsToTextMapper
from .tokenize import (
    PaddingMapper,
    TruncateSingleFieldMapper,
    ValidUnicodeMapper,
)
from .types import BinarizerMapper, CastMapper, LookupMapper, OneHotMapper

__all__ = [
    "AttentionMaskSequencePaddingMapper",
    "BinarizerMapper",
    "CastMapper",
    "ChangeFieldsMapper",
    "EnumerateFieldMapper",
    "FillEncodedPromptMapper",
    "FillTextPromptMapper",
    "FilterMapper",
    "FixedBatchSizeMapper",
    "FlattenMapper",
    "FtfyMapper",
    "GlomMapper",
    "IndicesToMaskMapper",
    "LabelsMaskerMapper",
    "LookupMapper",
    "MakeAttentionMaskMapper",
    "MakeFieldMapper",
    "MaskToIndicesMapper",
    "MaskToRangeMapper",
    "MockMapper",
    "MultiSequenceStriderMapper",
    "OneHotMapper",
    "PaddingMapper",
    "RangeToMaskMapper",
    "RenameFieldsMapper",
    "SequencesConcatenateMapper",
    "SingleSequenceStriderMapper",
    "SingleSequenceStriderMapperWithLocations",
    "SingleValueToSequenceMapper",
    "TextToWordsMapper",
    "TokensSequencesPaddingMapper",
    "TokenTypeIdsSequencePaddingMapper",
    "TruncateMultipleFieldsMapper",
    "TruncateMultipleNestedFieldsMapper",
    "TruncateSingleFieldMapper",
    "UnpackingMapper",
    "ValidUnicodeMapper",
    "WordsToTextMapper",
]
