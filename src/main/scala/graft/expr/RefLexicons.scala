package graft.expr

/** The reference system's REAL lexicons, as data.
  *
  * The operator machinery (tiered first-match scoring, alias-normalized
  * entity extraction) is generic and lives in [[Lexicon]] / `ops`; this
  * object carries the exact lexicon CONTENT the reference ships, so the
  * engine can be pointed at the reference's own committed danmaku CSVs
  * and reproduce its pipelines verbatim (see `ops.Fidelity`).
  *
  * Sources (data constants, not code):
  *   - fanRen character alias map:
  *     relation_graph/danmaku_analysis_cluster.py:41-107
  *   - SPY×FAMILY character alias map (the commented-out variant that
  *     produced dataset_processed/spy_family_result_*.csv):
  *     relation_graph/danmaku_analysis_cluster.py:30-38
  *   - 4-tier energy lexicon: hot/spark_energy.py:44-52
  *   - segmentation stopword set: hot/preprocess_high_energy.py:46-49
  *     (carried below as [[segStopwords]]; `TextFunctions.stopwords` is
  *     the unrelated English list for the synthetic-corpus pipelines)
  */
object RefLexicons {

  /** canonical character → alias spellings ("凡人修仙传" corpus).
    * Matching is SUBSTRING containment per alias, set-deduped per row —
    * danmaku_analysis_cluster.py:103-106. Order of entries is
    * irrelevant to semantics (every alias is tested; no first-hit-wins).
    */
  val fanRen: Seq[(String, Seq[String])] = Seq(
    "韩立" -> Seq("韩立", "二愣子", "韩跑跑", "跑跑", "韩老魔", "韩天尊", "韩师弟", "小韩"),
    "厉飞雨" -> Seq("厉飞雨", "厉师兄"),
    "南宫婉" -> Seq("南宫婉", "婉儿", "南宫", "师娘"),
    "陈巧倩" -> Seq("陈巧倩", "陈师姐", "巧倩"),
    "董萱儿" -> Seq("董萱儿", "红拂弟子"),
    "墨彩环" -> Seq("墨彩环", "彩环"),
    "紫灵仙子" -> Seq("紫灵", "紫灵仙子", "汪凝"),
    "元瑶" -> Seq("元瑶"),
    "银月" -> Seq("银月"),
    "墨大夫" -> Seq("墨居仁", "墨大夫", "墨老"),
    "王蝉" -> Seq("王蝉", "少门主"),
    "大衍神君" -> Seq("大衍神君", "大衍", "老鬼"),
    "曲魂" -> Seq("曲魂", "张铁"),
    "雷万鹤" -> Seq("雷万鹤", "雷师伯"),
    "令狐老祖" -> Seq("令狐老祖"),
    "文思月" -> Seq("文思月"),
    "小绿瓶" -> Seq("掌天瓶", "小绿瓶", "瓶子"))

  /** canonical character → alias spellings (SPY×FAMILY corpus). */
  val spyFamily: Seq[(String, Seq[String])] = Seq(
    "阿尼亚" -> Seq("瓜神", "阿尼亚", "安妮亚", "花生"),
    "黄昏" -> Seq("黄昏", "劳埃德", "父亲", "罗伊德"),
    "约尔" -> Seq("约尔", "荆棘公主", "约儿", "太太", "睡美人", "妈妈"),
    "次子" -> Seq("次子", "达米安"),
    "尤里" -> Seq("尤里", "弟弟"),
    "邦德" -> Seq("邦德", "狗", "狗狗"),
    "贝威" -> Seq("贝威", "蓬蓬头"))

  /** Ordered 4-tier energy lexicon, first matching tier wins, over
    * lowercased text; non-match → 1.0 (spark_energy.py:41-59). All
    * terms are already lowercase (matching happens after `lower`).
    */
  val energyTiers: Seq[(Seq[String], Double)] = Seq(
    Seq("优雅", "elegance", "哇库", "哇酷", "waku", "瓜神", "世界名画", "名场面") -> 5.0,
    Seq("次子", "昏爹", "父亲", "约尔", "太太", "荆棘公主", "邦德", "上岸", "读心",
      "花生", "吃花生", "手雷", "母亲", "妈妈", "阿尼亚") -> 3.0,
    Seq("高能", "泪目", "起立", "卧槽", "牛逼", "awsl", "封神", "致敬", "完结",
      "撒花", "好帅", "可爱") -> 2.0,
    Seq("哈哈", "hhh", "www", "233", "打卡", "第一", "热乎") -> 0.5)

  /** The reference's 36-entry Chinese stopword set, dropped from the
    * segmented word stream before frequency counting
    * (preprocess_high_energy.py:46-49). The length>1 filter downstream
    * already removes the single-char members; they are kept anyway so
    * this constant IS the reference set, not a trimmed variant.
    */
  val segStopwords: Set[String] = Set(
    "的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一",
    "一个", "上", "也", "很", "到", "说", "要", "去", "你", "会", "着",
    "没有", "看", "好", "自己", "这",
    "啊", "吧", "呀", "嘛", "呢", "哈", "哦", "嗯")
}
