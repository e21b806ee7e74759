from .contrib import (
    AddEvidencesLocationMapper,
    ConcatenateContextMapper,
    OneVsOtherAnnotatorMapper,
    ReplaceIfNoEvidencePromptMapper,
    UniqueAnswerMapper,
)
from .prompting import (
    BaseRecipe,
    CollatorRecipe,
    JinjaRecipe,
    PromptingRecipe,
)

__all__ = [
    "AddEvidencesLocationMapper",
    "BaseRecipe",
    "CollatorRecipe",
    "ConcatenateContextMapper",
    "JinjaRecipe",
    "OneVsOtherAnnotatorMapper",
    "PromptingRecipe",
    "ReplaceIfNoEvidencePromptMapper",
    "UniqueAnswerMapper",
]
