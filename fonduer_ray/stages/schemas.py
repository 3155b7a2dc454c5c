"""Explicit Arrow schemas for every stage boundary.

One row per document through the context/mention/candidate stages; nested
list<struct> columns carry the context tree (the Ray-native replacement for
the reference's one-table-per-Context-type relational model,
``parser/models/*``). Fixing schemas explicitly keeps blocks type-stable even
when a batch has only empty lists (Arrow would otherwise infer null types).
"""

from __future__ import annotations

import pyarrow as pa

_s = pa.string()
_i = pa.int32()
_f = pa.float32()
_ls = pa.list_(pa.string())
_li = pa.list_(pa.int32())

SENTENCE_STRUCT = pa.struct(
    [
        ("doc_name", _s),
        ("position", _i),
        ("stable_id", _s),
        ("paragraph_position", _i),
        ("section_position", _i),
        ("text", _s),
        ("words", _ls),
        ("char_offsets", _li),
        ("abs_char_offsets", _li),
        ("lemmas", _ls),
        ("pos_tags", _ls),
        ("ner_tags", _ls),
        ("dep_parents", _li),
        ("dep_labels", _ls),
        ("xpath", _s),
        ("html_tag", _s),
        ("html_attrs", _ls),
        ("table_position", _i),
        ("cell_position", _i),
        ("row_start", _i),
        ("row_end", _i),
        ("col_start", _i),
        ("col_end", _i),
        ("page", _li),
        ("top", _li),
        ("left", _li),
        ("bottom", _li),
        ("right", _li),
    ]
)

SECTION_STRUCT = pa.struct([("position", _i), ("name", _s)])
PARAGRAPH_STRUCT = pa.struct(
    [
        ("position", _i),
        ("name", _s),
        ("section_position", _i),
        ("table_position", _i),
        ("cell_position", _i),
        ("figure_position", _i),
        ("caption_position", _i),
    ]
)
TABLE_STRUCT = pa.struct(
    [("position", _i), ("section_position", _i), ("parent_cell", _i)]
)
CELL_STRUCT = pa.struct(
    [
        ("position", _i),
        ("table_position", _i),
        ("row_start", _i),
        ("row_end", _i),
        ("col_start", _i),
        ("col_end", _i),
        ("html_tag", _s),
    ]
)
FIGURE_STRUCT = pa.struct(
    [("position", _i), ("section_position", _i), ("cell_position", _i), ("url", _s)]
)
CAPTION_STRUCT = pa.struct(
    [("position", _i), ("table_position", _i), ("figure_position", _i)]
)

MENTION_STRUCT = pa.struct(
    [
        ("mention_type", _s),
        ("stable_id", _s),
        ("sentence_position", _i),
        ("char_start", _i),
        ("char_end", _i),
        ("text", _s),
        ("implicit", pa.bool_()),
        ("expander_key", _s),
        ("position", _i),
        ("expanded_words", _ls),
    ]
)

CANDIDATE_STRUCT = pa.struct(
    [
        ("relation", _s),
        ("stable_id", _s),
        ("split", _i),
        # parallel arrays, one element per relation argument
        ("arg_types", _ls),
        ("arg_stable_ids", _ls),
        ("arg_sentence_positions", _li),
        ("arg_char_starts", _li),
        ("arg_char_ends", _li),
        ("arg_texts", _ls),
        ("arg_implicit", pa.list_(pa.bool_())),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_name", _s),
        ("stable_id", _s),
        ("text", _s),
        ("lang", _s),
        ("sections", pa.list_(SECTION_STRUCT)),
        ("paragraphs", pa.list_(PARAGRAPH_STRUCT)),
        ("tables", pa.list_(TABLE_STRUCT)),
        ("cells", pa.list_(CELL_STRUCT)),
        ("figures", pa.list_(FIGURE_STRUCT)),
        ("captions", pa.list_(CAPTION_STRUCT)),
        ("sentences", pa.list_(SENTENCE_STRUCT)),
    ]
)

DOC_MENTION_SCHEMA = DOC_SCHEMA.append(
    pa.field("mentions", pa.list_(MENTION_STRUCT))
)

DOC_CANDIDATE_SCHEMA = DOC_MENTION_SCHEMA.append(
    pa.field("candidates", pa.list_(CANDIDATE_STRUCT))
)

MENTION_ROW_SCHEMA = pa.schema(
    [("doc_name", _s)] + [(f.name, f.type) for f in MENTION_STRUCT]
)

CANDIDATE_ROW_SCHEMA = pa.schema(
    [("doc_name", _s)] + [(f.name, f.type) for f in CANDIDATE_STRUCT]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("doc_name", _s),
        ("candidate_stable_id", _s),
        ("relation", _s),
        ("split", _i),
        ("keys", _ls),
        ("values", pa.list_(_f)),
    ]
)

LABEL_SCHEMA = pa.schema(
    [
        ("doc_name", _s),
        ("candidate_stable_id", _s),
        ("relation", _s),
        ("split", _i),
        ("keys", _ls),
        ("values", _li),  # sparse encoding: 0 = abstain (shifted by +1)
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", _s),
        ("pred", _s),
        ("obj", _s),
        ("doc_name", _s),
        ("candidate_stable_id", _s),
        ("score", pa.float64()),
    ]
)

ERROR_SCHEMA = pa.schema(
    [("doc_name", _s), ("stage", _s), ("error", _s)]
)
