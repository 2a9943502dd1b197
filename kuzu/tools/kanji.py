"""Kanji variant (itaiji) normalization maps.

Capability parity with the reference ``convert_kanji.py`` /
``create_itaiji_to_hyojun_map.py`` (P38): map variant characters (itaiji) to
their standard forms (hyojun) when normalizing OCR output or training text.
The built-in seed map covers common kuzushiji-era variants; project maps
load from JSON ({variant: standard}).
"""

from __future__ import annotations

import json
from pathlib import Path

# seed itaiji -> hyojun pairs (common classical/variant forms)
SEED_ITAIJI: dict[str, str] = {
    "亞": "亜", "惡": "悪", "壓": "圧", "圍": "囲", "爲": "為",
    "醫": "医", "壹": "壱", "稻": "稲", "飮": "飲", "隱": "隠",
    "營": "営", "榮": "栄", "衞": "衛", "驛": "駅", "圓": "円",
    "鹽": "塩", "奧": "奥", "應": "応", "歐": "欧", "毆": "殴",
    "櫻": "桜", "假": "仮", "會": "会", "繪": "絵", "擴": "拡",
    "學": "学", "嶽": "岳", "樂": "楽", "勸": "勧", "氣": "気",
    "歸": "帰", "舊": "旧", "據": "拠", "擧": "挙", "峽": "峡",
    "狹": "狭", "曉": "暁", "區": "区", "驅": "駆", "勳": "勲",
    "縣": "県", "儉": "倹", "劍": "剣", "險": "険", "檢": "検",
    "顯": "顕", "驗": "験", "嚴": "厳", "廣": "広", "恆": "恒",
    "國": "国", "濟": "済", "碎": "砕", "齋": "斎", "劑": "剤",
    "澤": "沢", "殘": "残", "絲": "糸", "辭": "辞", "舍": "舎",
    "壽": "寿", "收": "収", "從": "従", "澁": "渋", "獸": "獣",
    "縱": "縦", "敍": "叙", "燒": "焼", "證": "証", "乘": "乗",
    "疊": "畳", "孃": "嬢", "讓": "譲", "釀": "醸", "眞": "真",
    "寢": "寝", "愼": "慎", "盡": "尽", "圖": "図", "粹": "粋",
    "醉": "酔", "穗": "穂", "瀨": "瀬", "齊": "斉", "靜": "静",
    "攝": "摂", "戰": "戦", "淺": "浅", "潛": "潜", "繊": "繊",
    "錢": "銭", "禪": "禅", "曾": "曽", "瘦": "痩", "騷": "騒",
    "屬": "属", "對": "対", "體": "体", "帶": "帯", "滯": "滞",
    "臺": "台", "瀧": "滝", "擇": "択", "單": "単", "團": "団",
    "斷": "断", "癡": "痴", "遲": "遅", "晝": "昼", "蟲": "虫",
    "廳": "庁", "聽": "聴", "鎭": "鎮", "遞": "逓", "鐵": "鉄",
    "點": "点", "傳": "伝", "黨": "党", "盜": "盗", "燈": "灯",
    "當": "当", "獨": "独", "讀": "読", "屆": "届", "繩": "縄",
    "貳": "弐", "惱": "悩", "腦": "脳", "廢": "廃", "拜": "拝",
    "賣": "売", "麥": "麦", "發": "発", "髮": "髪", "拔": "抜",
    "濱": "浜", "佛": "仏", "竝": "並", "變": "変", "邊": "辺",
    "辨": "弁", "寶": "宝", "豐": "豊", "沒": "没", "滿": "満",
    "彌": "弥", "藥": "薬", "與": "与", "豫": "予", "餘": "余",
    "譽": "誉", "搖": "揺", "樣": "様", "謠": "謡", "來": "来",
    "賴": "頼", "亂": "乱", "覽": "覧", "龍": "竜", "兩": "両",
    "獵": "猟", "綠": "緑", "壘": "塁", "淚": "涙", "勵": "励",
    "禮": "礼", "靈": "霊", "齡": "齢", "戀": "恋", "爐": "炉",
    "勞": "労", "樓": "楼", "灣": "湾",
}


class ItaijiNormalizer:
    def __init__(self, mapping: dict[str, str] | None = None):
        self.map = dict(SEED_ITAIJI)
        if mapping:
            self.map.update(mapping)

    @classmethod
    def from_json(cls, path: str | Path) -> "ItaijiNormalizer":
        return cls(json.loads(Path(path).read_text(encoding="utf-8")))

    def normalize(self, text: str) -> str:
        return "".join(self.map.get(c, c) for c in text)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(
            json.dumps(self.map, ensure_ascii=False, indent=0), encoding="utf-8"
        )


def build_map_from_pairs(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """(variant, standard) pairs -> map, rejecting chains/conflicts
    (reference create_itaiji_to_hyojun_map)."""
    out: dict[str, str] = {}
    for variant, standard in pairs:
        if variant == standard:
            continue
        if variant in out and out[variant] != standard:
            raise ValueError(f"conflicting mapping for {variant!r}")
        out[variant] = standard
    # resolve chains a->b, b->c => a->c
    for v in list(out):
        seen = {v}
        t = out[v]
        while t in out and t not in seen:
            seen.add(t)
            t = out[t]
        out[v] = t
    return out
