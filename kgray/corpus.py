"""Deterministic synthetic LIC-shaped corpus generator.

Generates the two fixture tables of FIXTURES.md:

* F2 ``lic_sentences``  — flat sentence rows (doc_id, text, postag, spo_list),
  the reference's record shape (/root/reference/README.md:19-39,
  classification/dataset.py:32-41); golden ``spo_list`` exact by construction.
* F1 ``documents_interleaved`` — the flagship input shape
  (doc_id, spans: list<struct<kind,text,media_ref,offset>>) per
  BASELINE.json input_hint; text spans shred the sentence, media spans are
  interleaved with opaque ``media://`` refs.

Determinism: every row is a pure function of (seed, doc_id) via sha1 — no
wall clock, no global RNG, independent of partitioning.  Distribution
mirrors the reference corpus stats: 43%/33%/14%/6%/4% rows with 1..5
schema instances (/root/reference/pytorch/analysis/spo_count.py:48-50),
head-skewed predicate popularity, max text length <= 300
(/root/reference/pytorch/analysis/max_length.py:14-17).

Edge cases planted (rates in ``EDGE_RATES``): subject==object rows for
改编自 exercising the odd-occurrence rule (labeling/tagging.py:25-26),
1-char and 2-char entities (tagging.py:29-33), 《》-wrapped entities for
the bookname normalizer (calc_pr.py:41-45), alias surface forms (· dropped
from person names) feeding entity linking, and empty-postag rows
(labeling/dataset.py:52-53).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

from kgray.schema import (
    DOCUMENTS_INTERLEAVED,
    LIC_SENTENCES,
    NUM_SCHEMAS,
    SCHEMAS,
)
from kgray.templates import TEMPLATES, Template

# ---------------------------------------------------------------------------
# Entity pools — fixed, deterministic, shared across all docs (so entities
# co-occur across documents and linking/canonicalization has real work).
# ---------------------------------------------------------------------------

_SURNAMES = list("李王张刘陈杨赵黄周吴徐孙胡朱高林何郭马罗梁宋郑谢韩唐冯于董萧程曹袁邓许")
_GIVEN = list("伟芳娜敏静丽强磊军洋勇艳杰娟涛明超秀霞平刚桂英华玉兰金文辉力成康星光天达安岩中茂进林有坚和彪博诚先敬震振壮会思群豪心邦承乐绍功松善厚庆磊民友裕河哲江超浩亮政谦亨奇固之轮翰朗伯宏言若鸣朋斌梁栋维启克伦翔旭鹏泽晨辰士以建家致树炎德行时泰盛雄琛钧冠策腾楠榕风航弘")
_WORK_CHARS = list("梦江山河月风云雪花春秋夏冬星光影城海天龙凤缘情爱恨歌泪心魂录传记志书笔谈话语路桥灯火红蓝青紫金银铁石玉兰竹松梅夜晨雾雨虹霞")
_ORG_CHARS = list("华中天信达世创科博远鸿联众益泰恒隆兴盛安立方正元启宏伟新高")
_PLACE_CHARS = list("安宁平乐康顺和兴隆昌盛泰华南北东西中山川林田江河湖海岭坡岗城")
_TEXT_CHARS = list("子卿伯仲叔季文武成康昭穆恭惠襄景")


def _rng(*key: object) -> random.Random:
    h = hashlib.sha1("|".join(str(k) for k in key).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _make_names(
    rng: random.Random, n: int, first: list[str], rest: list[str],
    min_len: int, max_len: int,
) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        ln = rng.randint(min_len, max_len)
        name = rng.choice(first) + "".join(rng.choice(rest) for _ in range(ln - 1))
        if name not in seen:
            seen.add(name)
            out.append(name)
    return out


def _build_pools(pool_seed: int = 7, size: int = 400) -> dict[str, list[str]]:
    pools: dict[str, list[str]] = {}

    rng = _rng("persons", pool_seed)
    persons = _make_names(rng, size, _SURNAMES, _GIVEN, 2, 3)
    # ~10% dotted western-style names (alias = dot dropped; linking workload)
    for i in range(0, size, 10):
        a = "".join(rng.choice(_GIVEN) for _ in range(2))
        b = "".join(rng.choice(_GIVEN) for _ in range(2))
        persons[i] = f"{a}·{b}"
    pools["人物"] = persons
    pools["历史人物"] = _make_names(_rng("hist", pool_seed), size // 4, _SURNAMES, _TEXT_CHARS, 2, 3)

    works = _make_names(_rng("works", pool_seed), size, _WORK_CHARS, _WORK_CHARS, 2, 4)
    works[0] = "碑"      # 1-char entity (tagging.py S- branch)
    works[1] = "端脑"    # 2-char entity (tagging.py B/E branch)
    for t in ("影视作品", "作品", "图书作品", "书籍", "网络小说", "音乐专辑", "歌曲"):
        pools[t] = works

    orgs = _make_names(_rng("orgs", pool_seed), size // 2, _ORG_CHARS, _ORG_CHARS, 3, 4)
    pools["企业"] = [w + "公司" for w in orgs]
    pools["机构"] = [w + "研究院" for w in orgs[: size // 4]]
    pools["出版社"] = [w + "出版社" for w in orgs[: size // 8]]
    pools["学校"] = [w + "大学" for w in orgs[: size // 8]]
    pools["网站"] = [w + "网" for w in orgs[: size // 8]]
    pools["电视综艺"] = _make_names(_rng("tv", pool_seed), size // 4, _WORK_CHARS, _WORK_CHARS, 3, 5)

    places = _make_names(_rng("places", pool_seed), size // 2, _PLACE_CHARS, _PLACE_CHARS, 2, 3)
    pools["地点"] = places
    pools["城市"] = [w + "市" for w in places[: size // 4]]
    pools["国家"] = [w + "国" for w in places[size // 4 : size // 2]]
    pools["行政区"] = [w + "区" for w in places[: size // 4]]
    pools["景点"] = [w + "山" for w in places[: size // 8]]

    rng = _rng("numbers", pool_seed)
    pools["Number"] = [
        f"{rng.randint(1, 9999)}{rng.choice(['万', '平方千米', '厘米', '米', '亿元', '年'])}"
        for _ in range(size // 4)
    ]
    rng = _rng("dates", pool_seed)
    pools["Date"] = [
        f"{rng.randint(1900, 2019)}年{rng.randint(1, 12)}月{rng.randint(1, 28)}日"
        for _ in range(size // 4)
    ]
    pools["Text"] = _make_names(_rng("texts", pool_seed), size // 8, _TEXT_CHARS, _TEXT_CHARS, 2, 3)
    pools["目"] = [w + "目" for w in pools["Text"][: size // 16]]
    pools["生物"] = _make_names(_rng("bio", pool_seed), size // 8, _WORK_CHARS, _PLACE_CHARS, 2, 3)
    pools["气候"] = ["温带季风气候", "亚热带湿润气候", "高原山地气候", "热带雨林气候"]
    pools["语言"] = [w + "语" for w in pools["Text"][: size // 16]]
    pools["学科专业"] = [w + "工程学" for w in pools["Text"][: size // 16]]
    return pools


POOLS: dict[str, list[str]] = _build_pools()

# head-skewed schema popularity (SURVEY.md §4: head predicates dominate).
# weight_i = 1/(rank_i+1)^0.8 over a fixed shuffled ranking with 主演 first.
def _schema_weights() -> np.ndarray:
    order = list(range(NUM_SCHEMAS))
    head = next(s.schema_id for s in SCHEMAS if s.predicate == "主演")
    order.remove(head)
    _rng("schema-order").shuffle(order)
    order.insert(0, head)
    w = np.zeros(NUM_SCHEMAS)
    for rank, sid in enumerate(order):
        w[sid] = 1.0 / (rank + 1) ** 0.8
    return w / w.sum()


SCHEMA_WEIGHTS = _schema_weights()
_K_PROBS = [0.43, 0.33, 0.14, 0.06, 0.04]  # spo_count.py:48-50 shape

EDGE_RATES = {
    "sub_eq_obj": 0.5,    # of 改编自 rows: object == subject (tagging.py:25-26)
    "alias_form": 0.5,    # of dotted persons: drop the · (linking workload)
    "empty_postag": 0.01, # rows with postag=[] (labeling/dataset.py:52-53)
    "media_span": 0.35,   # chance of a media span between text spans
}


def _pick_entity(rng: random.Random, ent_type: str) -> str:
    name = rng.choice(POOLS[ent_type])
    if ent_type == "人物" and "·" in name and rng.random() < EDGE_RATES["alias_form"]:
        name = name.replace("·", "")
    return name


def _fill_template(rng: random.Random, tpl: Template) -> tuple[list[tuple[str, str]], list[dict]]:
    """Fill one template: returns (postag segments, golden spo dicts)."""
    schema = tpl.schema
    subject = _pick_entity(rng, schema.subject_type)
    if schema.predicate == "改编自" and rng.random() < EDGE_RATES["sub_eq_obj"]:
        objects = [subject]
    elif tpl.multi_object:
        n_obj = rng.randint(1, 3)
        objects = []
        for _ in range(n_obj):  # order-preserving dedup: set order is not
            ent = _pick_entity(rng, schema.object_type)  # process-stable
            if ent not in objects:
                objects.append(ent)
    else:
        objects = [_pick_entity(rng, schema.object_type)]

    words: list[tuple[str, str]] = []
    from kgray.templates import ENTITY_POS

    for seg in tpl.segments:
        if seg[0] == "lit":
            words.append((seg[1], seg[2]))
        elif seg[0] == "S":
            words.append((subject, ENTITY_POS[schema.subject_type]))
        elif seg[0] == "O":
            words.append((objects[0], ENTITY_POS[schema.object_type]))
        elif seg[0] == "OBJS":
            for j, obj in enumerate(objects):
                if j:
                    words.append(("、", "w"))
                words.append((obj, ENTITY_POS[schema.object_type]))

    spo_list = [
        {
            "subject": subject,
            "subject_type": schema.subject_type,
            "predicate": schema.predicate,
            "object": obj,
            "object_type": schema.object_type,
        }
        for obj in objects
    ]
    return words, spo_list


def _entities_conflict(spos: list[dict], new_spos: list[dict]) -> bool:
    """True if any entity string is a proper substring of another — avoids
    overlapping tag writes that corrupt BIESO marks (see SURVEY.md §7.4)."""
    old = {s["subject"] for s in spos} | {s["object"] for s in spos}
    new = {s["subject"] for s in new_spos} | {s["object"] for s in new_spos}
    for a in old:
        for b in new:
            if a != b and (a in b or b in a):
                return True
    # identical entity reappearing under a different schema also muddies tags
    return bool(old & new)


def make_sentence(seed: int, doc_id: str) -> dict:
    """One LIC-shaped row, a pure function of (seed, doc_id)."""
    rng = _rng("doc", seed, doc_id)
    k = rng.choices(range(1, 6), weights=_K_PROBS)[0]

    words: list[tuple[str, str]] = []
    spo_list: list[dict] = []
    used_schemas: set[int] = set()
    for _ in range(k):
        for _attempt in range(8):
            sid = int(rng.choices(range(NUM_SCHEMAS), weights=SCHEMA_WEIGHTS)[0])
            if sid in used_schemas:
                continue
            seg_words, seg_spos = _fill_template(rng, TEMPLATES[sid])
            if _entities_conflict(spo_list, seg_spos):
                continue
            seg_len = sum(len(w) for w, _ in seg_words)
            cur_len = sum(len(w) for w, _ in words)
            if cur_len + seg_len + 1 > 298:  # reference max text length 300
                continue
            if words:
                words.append(("，", "w"))
            words.extend(seg_words)
            spo_list.extend(seg_spos)
            used_schemas.add(sid)
            break
    words.append(("。", "w"))

    text = "".join(w for w, _ in words)
    postag = [] if rng.random() < EDGE_RATES["empty_postag"] else [
        {"word": w, "pos": p} for w, p in words
    ]
    return {"doc_id": doc_id, "text": text, "postag": postag, "spo_list": spo_list}


def interleave(seed: int, row: dict) -> dict:
    """Shred one sentence row into the interleaved spans shape (F1).

    Text spans split at 、，。 boundaries (delimiter kept with the left
    span); media spans inserted between text spans with ``media://`` refs.
    ``offset`` = char offset of the span in the reconstructed text (media
    spans carry the offset of the insertion point), so
    concat(text spans sorted by sequence) == row text.
    """
    rng = _rng("media", seed, row["doc_id"])
    text = row["text"]
    pieces: list[str] = []
    start = 0
    for i, ch in enumerate(text):
        if ch in "，。":
            pieces.append(text[start : i + 1])
            start = i + 1
    if start < len(text):
        pieces.append(text[start:])

    spans: list[dict] = []
    offset = 0
    for piece in pieces:
        if spans and rng.random() < EDGE_RATES["media_span"]:
            ref = hashlib.sha1(f"{row['doc_id']}|{offset}".encode()).hexdigest()[:16]
            spans.append(
                {
                    "kind": rng.choice(["image", "audio"]),
                    "text": "",
                    "media_ref": f"media://{ref}",
                    "offset": offset,
                }
            )
        spans.append({"kind": "text", "text": piece, "media_ref": "", "offset": offset})
        offset += len(piece)
    return {"doc_id": row["doc_id"], "spans": spans}


# ---------------------------------------------------------------------------
# Batch/table builders
# ---------------------------------------------------------------------------

def sentences_table(doc_ids: list[str], seed: int = 42) -> pa.Table:
    rows = [make_sentence(seed, d) for d in doc_ids]
    return pa.Table.from_pylist(rows, schema=LIC_SENTENCES)


def interleaved_table(doc_ids: list[str], seed: int = 42) -> pa.Table:
    rows = [interleave(seed, make_sentence(seed, d)) for d in doc_ids]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_INTERLEAVED)


def doc_ids_for_range(start: int, stop: int) -> list[str]:
    return [f"doc-{i:08d}" for i in range(start, stop)]


def interleaved_dataset(n_docs: int, seed: int = 42, *, start: int = 0,
                        parallelism: int = -1):
    """Distributed generation: ray.data.range -> map_batches(gen).

    Each batch generates its own rows from its id range — deterministic
    regardless of block layout, no driver-side materialization.
    ``start`` offsets the doc-id range (append-mode batches need ids
    disjoint from the base corpus)."""
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        ids = [f"doc-{int(i) + start:08d}" for i in batch["id"]]
        return interleaved_table(ids, seed)

    return rd.range(n_docs, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        gen, batch_format="numpy", batch_size=2048
    )


def golden_triples_table(doc_ids: list[str], seed: int = 42) -> pa.Table:
    """Explode golden spo_list to flat triple rows (eval oracle, F4-ish)."""
    rows = []
    for d in doc_ids:
        row = make_sentence(seed, d)
        for spo in row["spo_list"]:
            rows.append({"doc_id": d, **spo})
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("subject", pa.string()),
                ("subject_type", pa.string()),
                ("predicate", pa.string()),
                ("object", pa.string()),
                ("object_type", pa.string()),
            ]
        ),
    )


def adversarial_docs(n_docs: int, seed: int = 13) -> "pa.Table":
    """Adversarial SKEW corpus (chaos fixture for the capped-block and
    salted-join paths; VERDICT r3 item 5):

    * Zipf(1.2) vocabulary — hot words dominate shingle space;
    * one head entity token prepended to 30% of docs — a hot mention /
      join key;
    * a 15%-of-corpus near-clique: identical text except the trailing
      token — nearly every LSH band of those docs collapses into ONE
      bucket ~10x+ the median (the degenerate-block case the
      ``max_block`` caps must bound).

    Deterministic in (seed, n_docs).  Returns (doc_id:int64,
    text:string, head:bool)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(2000)])
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = ranks ** -1.2
    p /= p.sum()
    picks = rng.choice(len(vocab), size=(n_docs, 30), p=p)
    clique = int(n_docs * 0.15)
    clique_body = " ".join(f"dup{i:02d}" for i in range(29))
    texts = []
    for i in range(n_docs):
        if i < clique:
            # identical but for the trailing token: ~all shingles shared
            t = f"{clique_body} tail{i % 7}"
        else:
            t = " ".join(vocab[picks[i]])
        if i % 10 < 3:
            t = "megacorp " + t
        texts.append(t)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "head": pa.array((np.arange(n_docs) % 10 < 3)),
        }
    )
