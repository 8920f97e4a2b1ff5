"""Per-schema sentence templates for the deterministic synthetic corpus.

Each of the 50 relation schemas (kgray.schema.SCHEMAS) gets one sentence
template: a list of segments, each either a literal (word, pos) pair or an
entity placeholder.  The same template drives three things:

1. corpus generation (kgray.corpus) — fill placeholders with entities from
   fixed per-type pools; golden ``spo_list`` is exact by construction;
   ``postag`` falls out of the segment list, preserving the reference
   invariant concat(word) == text
   (/root/reference/legacy/explore/check_composition.py:7-18);
2. the deterministic stage-1 classifier cue (kgray.ops.classify) — each
   template contains a unique ``cue`` literal;
3. the deterministic stage-2 labeler regex (kgray.ops.label) — derived
   mechanically from the template.

Templates are data, not copied code: the reference contains no templates
(its corpus is the official LIC-2019 download, not shipped).  Predicate
semantics follow /root/reference/legacy/labeling/bert/
produce_submit_json_file.py:27-76.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from kgray.schema import SCHEMAS, RelationSchema

# entity types whose surface form is wrapped in 《》 book quotes in text
# (cf. the 端脑/碑 worked examples, /root/reference/labeling/tagging.py:65-85)
BRACKET_TYPES = {"影视作品", "作品", "图书作品", "书籍", "网络小说", "音乐专辑"}

# placeholder markers used in the template strings below
S, O = "{S}", "{O}"


@dataclass
class Template:
    schema: RelationSchema
    # segments: ("lit", word, pos) | ("S",) | ("O",) | ("OBJS",)
    segments: list[tuple] = field(default_factory=list)
    cue: str = ""          # unique literal for the stage-1 classifier
    multi_object: bool = False  # OBJS slot takes 1-3 、-joined objects

    def regex(self) -> re.Pattern:
        """Extraction regex derived from the segments.

        Entity slots match a lazy run of chars excluding our punctuation
        alphabet; OBJS additionally allows 、-joined lists.
        """
        parts = []
        for idx, seg in enumerate(self.segments):
            # a slot with no literal after it must match greedily, else the
            # lazy run stops after one char (entities never contain ，。、《》
            # so greedy cannot overrun the template instance)
            has_tail = any(s[0] == "lit" for s in self.segments[idx + 1 :])
            ent = r"[^，。、《》]+?" if has_tail else r"[^，。、《》]+"
            if seg[0] == "lit":
                parts.append(re.escape(seg[1]))
            elif seg[0] == "S":
                parts.append(f"(?P<s>{ent})")
            elif seg[0] == "O":
                parts.append(f"(?P<o>{ent})")
            elif seg[0] == "OBJS":
                star = "*?" if has_tail else "*"
                parts.append(rf"(?P<o>{ent}(?:、{ent}){star})")
        return re.compile("".join(parts))


# pos tag for entity placeholders, by entity type
ENTITY_POS = {
    "人物": "nr", "历史人物": "nr",
    "影视作品": "nw", "作品": "nw", "图书作品": "nw", "书籍": "nw",
    "网络小说": "nw", "音乐专辑": "nw", "歌曲": "nw",
    "企业": "nt", "机构": "nt", "出版社": "nt", "学校": "nt",
    "网站": "nt", "电视综艺": "nt",
    "地点": "ns", "城市": "ns", "国家": "ns", "行政区": "ns", "景点": "ns",
    "Number": "m", "Date": "t",
    "Text": "nz", "目": "nz", "气候": "nz", "语言": "nz", "学科专业": "nz",
    "生物": "n",
}

# (subject_type, predicate, object_type) -> (template string, cue, multi_object)
# {S}/{O} are entity slots; {OBJS} a 、-joined multi-object slot.  Every cue
# is unique across schemas (asserted in tests/test_templates.py).
_SPECS: dict[tuple[str, str, str], tuple[str, str, bool]] = {
    ("人物", "父亲", "人物"): ("{S}的父亲是{O}", "的父亲是", False),
    ("人物", "妻子", "人物"): ("{S}的妻子是{O}", "的妻子是", False),
    ("人物", "母亲", "人物"): ("{S}的母亲是{O}", "的母亲是", False),
    ("人物", "丈夫", "人物"): ("{S}的丈夫是{O}", "的丈夫是", False),
    ("人物", "祖籍", "地点"): ("{S}祖籍是{O}", "祖籍是", False),
    ("企业", "总部地点", "地点"): ("{S}的总部设在{O}", "的总部设在", False),
    ("人物", "出生地", "地点"): ("{S}出生于{O}", "出生于", False),
    ("生物", "目", "目"): ("{S}在分类上属于{O}", "在分类上属于", False),
    ("行政区", "面积", "Number"): ("{S}的总面积为{O}", "的总面积为", False),
    ("机构", "简称", "Text"): ("{S}简称为{O}", "简称为", False),
    ("影视作品", "上映时间", "Date"): ("{S}于{O}正式上映", "正式上映", False),
    ("歌曲", "所属专辑", "音乐专辑"): ("歌曲{S}收录于专辑{O}", "收录于专辑", False),
    ("企业", "注册资本", "Number"): ("{S}的注册资本为{O}", "的注册资本为", False),
    ("国家", "首都", "城市"): ("{S}的首都是{O}", "的首都是", False),
    ("影视作品", "导演", "人物"): ("{S}是由{O}执导的影视作品", "执导", False),
    ("历史人物", "字", "Text"): ("{S}表字{O}", "表字", False),
    ("人物", "身高", "Number"): ("{S}的身高为{O}", "的身高为", False),
    ("影视作品", "出品公司", "企业"): ("{S}由{O}出品发行", "出品发行", False),
    ("学科专业", "修业年限", "Number"): ("{S}的修业年限为{O}", "的修业年限为", False),
    ("人物", "出生日期", "Date"): ("{S}的出生日期是{O}", "的出生日期是", False),
    ("影视作品", "制片人", "人物"): ("{S}的制片人是{O}", "的制片人是", False),
    ("影视作品", "编剧", "人物"): ("{S}由{O}担任编剧", "担任编剧", False),
    ("人物", "国籍", "国家"): ("{S}的国籍是{O}", "的国籍是", False),
    ("地点", "海拔", "Number"): ("{S}海拔高度为{O}", "海拔高度为", False),
    ("网络小说", "连载网站", "网站"): ("小说{S}在{O}上连载", "上连载", False),
    ("历史人物", "朝代", "Text"): ("{S}是{O}时期的历史人物", "时期的历史人物", False),
    ("人物", "民族", "Text"): ("{S}是{O}族人", "族人", False),
    ("历史人物", "号", "Text"): ("{S}别号{O}", "别号", False),
    ("书籍", "出版社", "出版社"): ("{S}是由{O}出版的图书", "出版的图书", False),
    ("电视综艺", "主持人", "人物"): ("{S}由{O}主持播出", "主持播出", False),
    ("学科专业", "专业代码", "Text"): ("{S}的专业代码为{O}", "的专业代码为", False),
    ("歌曲", "歌手", "人物"): ("歌曲{S}是由{O}演唱的", "演唱", False),
    ("歌曲", "作词", "人物"): ("歌曲{S}由{O}填词创作", "填词创作", False),
    ("网络小说", "主角", "人物"): ("小说{S}的主角名叫{O}", "的主角名叫", False),
    ("企业", "董事长", "人物"): ("{S}的董事长是{O}", "的董事长是", False),
    ("机构", "成立日期", "Date"): ("机构{S}成立于{O}", "成立于", False),
    ("企业", "成立日期", "Date"): ("公司{S}创办于{O}", "创办于", False),
    ("人物", "毕业院校", "学校"): ("{S}毕业于{O}", "毕业于", False),
    ("机构", "占地面积", "Number"): ("{S}占地面积达{O}", "占地面积达", False),
    ("国家", "官方语言", "语言"): ("{S}的官方语言是{O}", "的官方语言是", False),
    ("行政区", "邮政编码", "Text"): ("{S}的邮政编码为{O}", "的邮政编码为", False),
    ("行政区", "人口数量", "Number"): ("{S}的人口数量为{O}", "的人口数量为", False),
    ("景点", "所在城市", "城市"): ("景点{S}坐落于{O}", "坐落于", False),
    ("图书作品", "作者", "人物"): ("{S}的作者是{O}", "的作者是", False),
    ("歌曲", "作曲", "人物"): ("歌曲{S}由{O}谱曲", "谱曲", False),
    ("行政区", "气候", "气候"): ("{S}地区属{O}", "地区属", False),
    ("电视综艺", "嘉宾", "人物"): ("{S}邀请嘉宾{OBJS}", "邀请嘉宾", True),
    ("影视作品", "主演", "人物"): ("{S}是{OBJS}主演的影视作品", "主演", True),
    ("影视作品", "改编自", "作品"): ("{S}改编自漫画{O}", "改编自", False),
    ("企业", "创始人", "人物"): ("{S}由{O}创立", "创立", False),
}


def _compile_segments(spec: str, schema: RelationSchema) -> list[tuple]:
    """Turn a '{S}...{O}' spec string into segments with 《》 wrapping."""
    segs: list[tuple] = []

    def add_lit(text: str) -> None:
        if text:
            segs.append(("lit", text, "v"))

    def add_slot(marker: str, ent_type: str) -> None:
        if ent_type in BRACKET_TYPES:
            segs.append(("lit", "《", "w"))
            segs.append((marker,))
            segs.append(("lit", "》", "w"))
        else:
            segs.append((marker,))

    pos = 0
    for m in re.finditer(r"\{(S|O|OBJS)\}", spec):
        add_lit(spec[pos : m.start()])
        marker = m.group(1)
        if marker == "S":
            add_slot("S", schema.subject_type)
        elif marker == "O":
            add_slot("O", schema.object_type)
        else:
            add_slot("OBJS", schema.object_type)
        pos = m.end()
    add_lit(spec[pos:])
    return segs


def _build_templates() -> dict[int, Template]:
    out: dict[int, Template] = {}
    for schema in SCHEMAS:
        key = (schema.subject_type, schema.predicate, schema.object_type)
        spec, cue, multi = _SPECS[key]
        out[schema.schema_id] = Template(
            schema=schema,
            segments=_compile_segments(spec, schema),
            cue=cue,
            multi_object=multi,
        )
    return out


TEMPLATES: dict[int, Template] = _build_templates()
CUES: dict[int, str] = {sid: t.cue for sid, t in TEMPLATES.items()}
