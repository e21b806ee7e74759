"""Recipes: composed pipelines (reference: src/smashed/recipes/*).

A recipe is just a :class:`Pipeline` whose constructor chains a
sub-pipeline (reference BaseRecipe, base/recipes.py:8-25) — no new
machinery.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from ..core.pipeline import Pipeline
from ..operators.fields import ChangeFieldsMapper, RenameFieldsMapper
from ..operators.hf_tokenize import EncodeFieldsMapper, TokenizerMapper
from ..operators.jinja import (
    FewShotJinjaMapper,
    JinjaMapper,
    find_undeclared_variables,
)
from ..operators.prompting import (
    FillEncodedPromptMapper,
    TruncateMultipleFieldsMapper,
)
from ..operators.shape import SingleSequenceStriderMapper
from ..operators.text import TextToWordsMapper, WordsToTextMapper

VARSHOTS = "__shots__"


class BaseRecipe(Pipeline):
    """A pipeline assembled in ``__init__`` via :meth:`chain`."""

    def __init__(self) -> None:
        super().__init__([])

    def chain(self, mapper) -> "BaseRecipe":
        if isinstance(mapper, Pipeline):
            self.mappers.extend(mapper.mappers)
        else:
            self.mappers.append(mapper)
        return self


class PromptingRecipe(BaseRecipe):
    """Encode fields -> (stride) -> budgeted truncate -> fill encoded
    source (and target) prompts -> rename/prune
    (reference recipes/prompting.py:32-305)."""

    def __init__(
        self,
        tokenizer,
        source_template: str,
        source_add_bos_token: bool = True,
        source_add_eos_token: bool = False,
        target_template: Optional[str] = None,
        target_add_bos_token: bool = False,
        target_add_eos_token: bool = False,
        fields_to_truncate: Optional[Sequence[str]] = None,
        fields_to_stride: Optional[Sequence[str]] = None,
        stride_max_length: Optional[int] = None,
        stride_step: Optional[int] = None,
        target_output_name: str = "labels",
        is_split_into_words: bool = False,
        max_source_length: Optional[int] = None,
        max_target_length: Optional[int] = None,
        strategy: str = "longest",
        return_attention_mask: bool = True,
        return_token_type_ids: bool = False,
        extra_keep_field_names: Union[None, Sequence[str], Dict[str, str]] = None,
        extra_encode_fields: Optional[Sequence[str]] = None,
    ) -> None:
        super().__init__()
        fields_to_truncate = list(fields_to_truncate or [])
        fields_to_stride = list(fields_to_stride or [])
        extra_encode_fields = list(extra_encode_fields or [])
        if extra_keep_field_names is None:
            extra_keep_field_names = {}
        if not isinstance(extra_keep_field_names, dict):
            extra_keep_field_names = {f: f for f in extra_keep_field_names}

        source_prompt = FillEncodedPromptMapper(
            template=source_template,
            tokenizer=tokenizer,
            add_bos_token=source_add_bos_token,
            add_eos_token=source_add_eos_token,
            return_attention_mask=return_attention_mask,
            return_token_type_ids=return_token_type_ids,
        )
        fields_to_encode = list(source_prompt.input_fields) + extra_encode_fields

        target_prompt = None
        if target_template is not None:
            target_prompt = FillEncodedPromptMapper(
                template=target_template,
                tokenizer=tokenizer,
                add_bos_token=target_add_bos_token,
                add_eos_token=target_add_eos_token,
                return_attention_mask=False,
                output_prefix="decoder",
            )
            fields_to_encode += list(target_prompt.input_fields)

        self.chain(
            EncodeFieldsMapper(
                fields_to_encode=fields_to_encode,
                tokenizer=tokenizer,
                is_split_into_words=is_split_into_words,
            )
        )

        self._add_truncation_and_striding(
            prompt_mapper=source_prompt,
            tokenizer=tokenizer,
            all_fields_to_truncate=fields_to_truncate,
            all_fields_to_stride=fields_to_stride,
            strategy=strategy,
            max_length=max_source_length,
            stride_max_length=stride_max_length,
            stride_step=stride_step,
        )
        if target_prompt is not None:
            self._add_truncation_and_striding(
                prompt_mapper=target_prompt,
                tokenizer=tokenizer,
                all_fields_to_truncate=fields_to_truncate,
                all_fields_to_stride=fields_to_stride,
                strategy=strategy,
                max_length=max_target_length or max_source_length,
                stride_max_length=stride_max_length,
                stride_step=stride_step,
            )

        self.chain(source_prompt)
        rename_map = {k: k for k in source_prompt.output_fields}
        if return_attention_mask:
            rename_map["attention_mask"] = "attention_mask"
        rename_map.update(extra_keep_field_names)
        if target_prompt is not None:
            self.chain(target_prompt)
            rename_map["decoder_input_ids"] = (
                "labels" if target_output_name == "labels" else "decoder_input_ids"
            )
        self.chain(
            RenameFieldsMapper(rename_fields_map=rename_map, remove_rest=True)
        )

    def _add_truncation_and_striding(
        self,
        prompt_mapper: FillEncodedPromptMapper,
        tokenizer,
        all_fields_to_truncate: Sequence[str],
        all_fields_to_stride: Sequence[str],
        strategy: str,
        max_length: Optional[int],
        stride_max_length: Optional[int],
        stride_step: Optional[int],
    ) -> None:
        """Reference recipes/prompting.py:240-305."""
        fields_to_truncate, fields_to_preserve, fields_to_stride = [], [], []
        for field_name in prompt_mapper.input_fields:
            if field_name in all_fields_to_truncate:
                fields_to_truncate.append(field_name)
            else:
                fields_to_preserve.append(field_name)
            if field_name in all_fields_to_stride:
                fields_to_stride.append(field_name)

        max_length_when_striding = (
            stride_max_length
            or max_length
            or getattr(tokenizer, "model_max_length", None)
        )
        for field_name in fields_to_stride:
            if max_length_when_striding is None:
                raise ValueError(
                    "Cannot stride if striding length is not provided"
                )
            self.chain(
                SingleSequenceStriderMapper(
                    field_to_stride=field_name,
                    max_length=max_length_when_striding,
                    stride=stride_step,
                )
            )
        if fields_to_truncate:
            # static prompt length (literal segment tokens) counts against
            # the budget (reference length_penalty, recipes/prompting.py:301)
            penalty = sum(len(ids) for ids, _ in prompt_mapper.segments)
            self.chain(
                TruncateMultipleFieldsMapper(
                    fields_to_truncate=fields_to_truncate,
                    fields_to_preserve=fields_to_preserve,
                    max_length=max_length,
                    strategy=strategy,
                    tokenizer=tokenizer,
                    length_penalty=penalty,
                )
            )


class JinjaRecipe(BaseRecipe):
    """words-split -> per-shot source/target truncation -> words-join ->
    (few-shot) jinja render -> tokenize source (+target -> labels) ->
    prune (reference recipes/promptsource.py:20-248)."""

    def __init__(
        self,
        tokenizer,
        jinja_template: str,
        num_shots: int = 0,
        max_source_length_per_shot: Optional[int] = None,
        max_target_length_per_shot: Optional[int] = None,
        truncation_strategy: str = "longest",
        use_words: bool = True,
        source_fields: Optional[Sequence[str]] = None,
        target_fields: Optional[Sequence[str]] = None,
        additional_fields_to_keep: Optional[Sequence[str]] = None,
        order_by: Sequence[str] = (),
    ) -> None:
        super().__init__()
        import re

        is_few_shot = VARSHOTS in find_undeclared_variables(jinja_template)
        if is_few_shot:
            template_mapper: JinjaMapper = FewShotJinjaMapper(
                jinja=jinja_template, num_shots=num_shots, order_by=order_by
            )
        else:
            template_mapper = JinjaMapper(jinja=jinja_template)

        fragments = jinja_template.split("|||")
        all_vars = {
            v
            for v in find_undeclared_variables(jinja_template)
            if v != VARSHOTS
        }
        src_fields = list(
            source_fields or {v for v in all_vars if v in fragments[0]}
        )
        tgt_fields = list(
            target_fields
            or {
                v
                for v in all_vars
                for frag in fragments[1:]
                if v in frag
            }
        )
        # prompt text with jinja control/variable blocks removed
        # (reference template_text, promptsource.py:157-166)
        template_text = [
            re.sub(r"\{(%|\{|#).+?(#|%|\})\}", "", t)
            for t in fragments
        ]
        source_text, *target_text = template_text

        def wc(t: str) -> int:
            return len([w for w in re.findall(r"\w+|[^\w\s]+", t)])

        if use_words:
            self.chain(TextToWordsMapper(fields=src_fields + tgt_fields))
            length_src_prompt = wc(source_text)
            length_tgt_prompt = max([wc(t) for t in target_text] or [0])
        else:
            length_src_prompt = len(source_text)
            length_tgt_prompt = max([len(t) for t in target_text] or [0])

        def ceil(x):
            return int(x + (1 if x % 1 else 0))

        if max_source_length_per_shot is not None:
            actual = (
                max_source_length_per_shot
                - ceil(
                    (max_target_length_per_shot or 0)
                    * (num_shots / (num_shots + 1))
                )
                - ceil(length_src_prompt / (num_shots + 1))
            )
            if actual < 1:
                raise ValueError(
                    "max_source_content_length must be at least equal to "
                    f"the length of the source prompt ({length_src_prompt})!"
                )
            self.chain(
                TruncateMultipleFieldsMapper(
                    fields_to_truncate=src_fields,
                    max_length=actual,
                    strategy=truncation_strategy,
                )
            )
        if target_text and max_target_length_per_shot:
            budget = max_target_length_per_shot - length_tgt_prompt
            if budget < 1:
                raise ValueError(
                    "max_target_content_length must be at least equal to "
                    f"the length of the target prompt ({length_tgt_prompt})!"
                )
            self.chain(
                TruncateMultipleFieldsMapper(
                    fields_to_truncate=tgt_fields,
                    max_length=budget,
                    strategy=truncation_strategy,
                )
            )
        if use_words:
            self.chain(WordsToTextMapper(fields=src_fields + tgt_fields))
        self.chain(template_mapper)
        self.chain(
            TokenizerMapper(
                tokenizer=tokenizer,
                input_field="source",
                add_special_tokens=False,
                return_attention_mask=True,
                truncation=True,
            )
        )
        keep = ["input_ids", "attention_mask"]
        if template_mapper.has_target:
            self.chain(
                TokenizerMapper(
                    tokenizer=tokenizer,
                    input_field="target",
                    output_rename_map={"input_ids": "labels"},
                    add_special_tokens=False,
                    return_attention_mask=False,
                    truncation=True,
                )
            )
            keep.append("labels")
        keep.extend(additional_fields_to_keep or [])
        self.chain(ChangeFieldsMapper(keep_fields=keep))


class CollatorRecipe(BaseRecipe):
    """Batch -> pad (reference recipes/collators.py): FixedBatchSize
    grouping then tokenizer-seeded list collation.  Tensorization is the
    client edge (``operators.converters.rows_to_torch``)."""

    def __init__(
        self,
        tokenizer=None,
        batch_size: Union[int, str] = 32,
        order_by: Sequence[str] = (),
        keep_last: bool = True,
        fields_pad_ids: Optional[Dict[str, int]] = None,
        unk_fields_pad_id: Optional[int] = None,
        pad_to_length: Optional[int] = None,
        pad_to_multiple_of: Optional[int] = None,
    ) -> None:
        super().__init__()
        from ..operators.batchers import FixedBatchSizeMapper
        from ..operators.collators import (
            FromTokenizerListCollatorMapper,
            ListCollatorMapper,
        )

        self.chain(
            FixedBatchSizeMapper(
                batch_size=batch_size, keep_last=keep_last, order_by=order_by
            )
        )
        if tokenizer is not None:
            self.chain(
                FromTokenizerListCollatorMapper(
                    tokenizer=tokenizer,
                    fields_pad_ids=fields_pad_ids,
                    unk_fields_pad_id=unk_fields_pad_id,
                    pad_to_length=pad_to_length,
                    pad_to_multiple_of=pad_to_multiple_of,
                )
            )
        else:
            self.chain(
                ListCollatorMapper(
                    fields_pad_ids=fields_pad_ids,
                    unk_fields_pad_id=unk_fields_pad_id,
                    pad_to_length=pad_to_length,
                    pad_to_multiple_of=pad_to_multiple_of,
                )
            )


class SlowCollatorRecipe(CollatorRecipe):
    """Reference SlowCollatorRecipe (recipes/collators.py:180-247):
    batch -> pad -> tensorize, where the reference's fast variant
    tensorizes before batching.  In the Spark rebuild tensorization is
    always at the client edge, so both orderings reduce to the same
    plan; the class exists for API parity."""
