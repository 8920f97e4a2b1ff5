"""Relation schemas and Arrow table schemas.

The 49-predicate -> (object_type, subject_type) relation map below is the
public LIC-2019/SKE competition schema set, as recorded (as data) in the
reference repo at
/root/reference/legacy/labeling/bert/produce_submit_json_file.py:27-76.
One predicate (成立日期) carries two type pairs, yielding 50 schemas total
(class_num=50, /root/reference/classification/config.py:24).

Schema identity = concat(subject_type + predicate + object_type) -> index,
mirroring /root/reference/classification/dataset.py:22-26.  Index order in
the reference is the line order of the (unshipped) ``all_50_schemas`` file;
ours is the deterministic sorted order of (predicate, subject_type,
object_type), which is stable across runs and partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

# predicate -> list of (object_type, subject_type); data from the public
# LIC-2019 schema set (see module docstring for provenance).
PREDICATE_TYPE_PAIRS: dict[str, list[tuple[str, str]]] = {
    "父亲": [("人物", "人物")],
    "妻子": [("人物", "人物")],
    "母亲": [("人物", "人物")],
    "丈夫": [("人物", "人物")],
    "祖籍": [("地点", "人物")],
    "总部地点": [("地点", "企业")],
    "出生地": [("地点", "人物")],
    "目": [("目", "生物")],
    "面积": [("Number", "行政区")],
    "简称": [("Text", "机构")],
    "上映时间": [("Date", "影视作品")],
    "所属专辑": [("音乐专辑", "歌曲")],
    "注册资本": [("Number", "企业")],
    "首都": [("城市", "国家")],
    "导演": [("人物", "影视作品")],
    "字": [("Text", "历史人物")],
    "身高": [("Number", "人物")],
    "出品公司": [("企业", "影视作品")],
    "修业年限": [("Number", "学科专业")],
    "出生日期": [("Date", "人物")],
    "制片人": [("人物", "影视作品")],
    "编剧": [("人物", "影视作品")],
    "国籍": [("国家", "人物")],
    "海拔": [("Number", "地点")],
    "连载网站": [("网站", "网络小说")],
    "朝代": [("Text", "历史人物")],
    "民族": [("Text", "人物")],
    "号": [("Text", "历史人物")],
    "出版社": [("出版社", "书籍")],
    "主持人": [("人物", "电视综艺")],
    "专业代码": [("Text", "学科专业")],
    "歌手": [("人物", "歌曲")],
    "作词": [("人物", "歌曲")],
    "主角": [("人物", "网络小说")],
    "董事长": [("人物", "企业")],
    "成立日期": [("Date", "机构"), ("Date", "企业")],
    "毕业院校": [("学校", "人物")],
    "占地面积": [("Number", "机构")],
    "官方语言": [("语言", "国家")],
    "邮政编码": [("Text", "行政区")],
    "人口数量": [("Number", "行政区")],
    "所在城市": [("城市", "景点")],
    "作者": [("人物", "图书作品")],
    "作曲": [("人物", "歌曲")],
    "气候": [("气候", "行政区")],
    "嘉宾": [("人物", "电视综艺")],
    "主演": [("人物", "影视作品")],
    "改编自": [("作品", "影视作品")],
    "创始人": [("人物", "企业")],
}


@dataclass(frozen=True)
class RelationSchema:
    schema_id: int
    subject_type: str
    predicate: str
    object_type: str

    @property
    def concat(self) -> str:
        """Class identity string (classification/dataset.py:22-26)."""
        return self.subject_type + self.predicate + self.object_type


def _build_schemas() -> list[RelationSchema]:
    triples = sorted(
        (pred, s_type, o_type)
        for pred, pairs in PREDICATE_TYPE_PAIRS.items()
        for (o_type, s_type) in pairs
    )
    return [
        RelationSchema(i, s_type, pred, o_type)
        for i, (pred, s_type, o_type) in enumerate(triples)
    ]


SCHEMAS: list[RelationSchema] = _build_schemas()
NUM_SCHEMAS: int = len(SCHEMAS)
assert NUM_SCHEMAS == 50

# concat identity -> schema_id (classification/dataset.py:22-26)
CONCAT_TO_ID: dict[str, int] = {s.concat: s.schema_id for s in SCHEMAS}
# flat predicate list (legacy produce_submit_json_file.py:135 analogue)
PREDICATES: list[str] = sorted(PREDICATE_TYPE_PAIRS)


def schemas_table() -> pa.Table:
    """The 50-row schema dimension table (FIXTURES.md F3)."""
    return pa.table(
        {
            "schema_id": pa.array([s.schema_id for s in SCHEMAS], pa.int32()),
            "subject_type": [s.subject_type for s in SCHEMAS],
            "predicate": [s.predicate for s in SCHEMAS],
            "object_type": [s.object_type for s in SCHEMAS],
        }
    )


# ---------------------------------------------------------------------------
# Arrow table schemas (FIXTURES.md F1-F5)
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# F1: flagship interleaved input (BASELINE.json input_hint)
DOCUMENTS_INTERLEAVED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

POSTAG_STRUCT = pa.struct([("word", pa.string()), ("pos", pa.string())])
SPO_STRUCT = pa.struct(
    [
        ("subject", pa.string()),
        ("subject_type", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_type", pa.string()),
    ]
)

# F2: LIC-shaped flat sentence corpus (reference README.md:19-39)
LIC_SENTENCES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.string()),
        ("postag", pa.list_(POSTAG_STRUCT)),
        ("spo_list", pa.list_(SPO_STRUCT)),
    ]
)

# F5: emitted triple table (labeling/predict.py:74-81 output analogue)
TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subject", pa.string()),
        ("subject_type", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_type", pa.string()),
        ("schema_id", pa.int32()),
    ]
)
