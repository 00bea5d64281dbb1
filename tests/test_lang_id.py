"""Production lang_id (ops/textstats.py): runs on bare (doc_id, text) with
no label column, covers 14 languages, predicts 'und' on no-signal text, and
holds >=90 % accuracy on a held-out synthetic multilingual corpus the
marker table was not written against."""

import pytest

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("lang-id-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


# held-out corpus: natural short sentences, 5 per language, written as
# ordinary text (markers occur only as the function words any real sentence
# of the language contains)
CORPUS = {
    "en": [
        "the weather was cold and the wind blew hard",
        "she carried a bag of apples and a loaf of bread",
        "the train left early and we missed the stop",
        "a cup of tea and a slice of cake",
        "the dog ran fast and the cat stayed slow",
    ],
    "es": [
        "el perro corre como los gatos del barrio",
        "una casa grande pero los cuartos son fríos",
        "el maestro habla como una persona sabia",
        "los niños juegan pero el parque cierra",
        "una canción triste como el mar",
    ],
    "fr": [
        "les enfants jouent dans le jardin avec des amis",
        "il est venu avec des fleurs dans les mains",
        "la maison est grande avec des fenêtres claires",
        "les rues sont calmes dans la nuit",
        "elle est partie avec les autres dans le train",
    ],
    "de": [
        "der hund und die katze sind nicht hier",
        "das wetter ist kalt und der wind weht",
        "die kinder spielen und der lehrer ist nicht da",
        "der zug ist spät und die reise ist lang",
        "die stadt ist alt und der fluss ist breit",
    ],
    "it": [
        "di che cosa parliamo per la cena, sono contento",
        "i colori della sera sono belli per tutti",
        "che bella giornata per una passeggiata di primavera",
        "sono arrivati per la festa della città",
        "il profumo di caffè che sento per strada",
    ],
    "pt": [
        "uma casa com mais flores por aqui quando chove",
        "ele chega com uma mala quando o trem para",
        "por favor traga mais pão com queijo",
        "quando a chuva passa, uma luz entra por aqui",
        "ela canta com mais alegria quando viaja",
    ],
    "nl": [
        "het huis is van een vriend, niet van mij, ze zijn weg",
        "een boek van de meester, het is niet nieuw",
        "ze zijn met het schip van de haven vertrokken",
        "het weer is koud, een jas is niet genoeg",
        "van wie is een fiets die niet op slot zijn kan",
    ],
    "ru": [
        "и он сказал что это не так как раньше",
        "это не то что мы хотели, и как теперь быть",
        "как хорошо что это не конец",
        "и снова дождь, не видно что впереди",
        "что это было и как это понять",
    ],
    "zh": [
        "我知道他是在这里了的原因",
        "这是我的书,我在看了",
        "他是我的朋友,在城里住了很久",
        "我的家在山的那边,是很远的地方",
        "天气是冷的,我在家里了",
    ],
    "ja": [
        "これは私の本です。昨日読みました",
        "先生の話はとても面白いです。よく笑いました",
        "朝の電車は混んでいます。駅で待ちました",
        "友達の家は遠いです。バスで行きました",
        "今日の天気は晴れです。公園を歩きました",
    ],
    "ko": [
        "그 아이는 공원에서 공을 차고 있다",
        "이 책은 도서관에서 빌린 것이다",
        "우리는 아침에 빵을 먹는다",
        "그 사람은 노래를 잘 부른다",
        "이 도시는 밤에도 밝다",
    ],
    "ar": [
        "ذهب الولد إلى المدرسة في الصباح",
        "خرجنا من البيت على عجل",
        "أعتقد أن الطقس جميل اليوم",
        "هذا الكتاب مفيد للقراءة",
        "وضعت الكوب على الطاولة في المطبخ",
    ],
    "hi": [
        "यह किताब बहुत अच्छी है",
        "वह स्कूल में पढ़ता है और खेलता है",
        "उस लड़की की आवाज़ मीठी है",
        "बारिश में बच्चे खुश होते हैं",
        "यह शहर रात में सुंदर लगता है",
    ],
    "th": [
        "เด็กเล่นอยู่ในสวนของโรงเรียน",
        "การเดินทางครั้งนี้สนุกมาก",
        "หนังสือเล่มนี้อยู่ที่โต๊ะ",
        "อาหารและน้ำอยู่ในครัว",
        "บ้านของเราอยู่ที่เชิงเขา",
    ],
    # round-7 additions (20 languages total)
    "sv": [
        "jag tror att det blir regn och blåst idag",
        "hon sa att hon inte ville komma med",
        "det var en bok som jag verkligen gillade",
        "vi gick ut fast det inte var varmt och soligt",
        "jag vet inte om han kommer att hinna",
    ],
    "da": [
        "jeg ved ikke hvad han mener med det",
        "hvor er bogen og hvad skal vi læse",
        "hun kom ikke og jeg gik hjem",
        "hvad sker der og hvor skal vi hen",
        "jeg kan ikke se hvor vejen ender",
    ],
    "fi": [
        "halusin tulla mutta juna oli myöhässä",
        "talo on suurempi kuin muistin ja sitten satoi",
        "otan vain yhden kupin kahvia kanssa",
        "ensin söimme ja sitten lähdimme kävelylle",
        "parempi myöhään kuin ei milloinkaan mutta tule",
    ],
    "pl": [
        "to jest dom ale nie mój",
        "nie wiem jak to działa przez cały dzień",
        "ona jest miła ale czasem nie słucha",
        "przeszliśmy przez park jak zwykle wieczorem",
        "to nie jest takie proste jak się wydaje",
    ],
    "el": [
        "και το πρωί ήπιαμε καφέ του χωριού",
        "το σπίτι που μένουμε είναι παλιό",
        "αυτό είναι για σένα και για μένα",
        "η θάλασσα του νησιού είναι καθαρή",
        "ο φίλος που ήρθε χθες έφυγε νωρίς",
    ],
    "bn": [
        "আমি বই পড়ি এবং গান শুনি",
        "সে কাজ করে কিন্তু ক্লান্ত হয় না",
        "তার বাড়ি নদীর ধারে এবং খুব সুন্দর",
        "আমি যাব কিন্তু একটু দেরি হবে",
        "বৃষ্টি পড়ে এবং তার ছাতা নেই",
    ],
}


def _df(spark):
    rows, truth = [], {}
    i = 0
    for lang, sents in CORPUS.items():
        for s in sents:
            rows.append((i, s))
            truth[i] = lang
            i += 1
    # bare (doc_id, text): the production signature -- NO label column
    return spark.createDataFrame(rows, "doc_id long, text string"), truth


def test_accuracy_on_held_out_multilingual_corpus(spark):
    from nreadspark.ops.textstats import lang_id

    df, truth = _df(spark)
    preds = {r["doc_id"]: r["predicted_lang"] for r in lang_id(df).collect()}
    correct = sum(preds[i] == truth[i] for i in truth)
    acc = correct / len(truth)
    wrong = {i: (truth[i], preds[i]) for i in truth if preds[i] != truth[i]}
    assert acc >= 0.9, f"accuracy {acc:.2f}; misclassified: {wrong}"


def test_und_for_no_signal_and_empty_text(spark):
    from nreadspark.ops.textstats import lang_id

    df = spark.createDataFrame(
        [(1, "xyzzy plugh quux frobnicate"), (2, ""), (3, "12345 67890")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lang_id(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["predicted_lang"] == "und" and out[i]["best_score"] == 0


def test_eval_join_shapes_and_agreement(spark):
    """lang_id_eval = lang_id + the label join; predictions must agree."""
    from pyspark.sql import functions as F

    from nreadspark.ops.textstats import lang_id, lang_id_eval

    df, truth = _df(spark)
    labeled = df.withColumn(
        "lang",
        F.udf(lambda i: truth[i])("doc_id"),
    )
    ev = lang_id_eval(labeled)
    assert ev.columns == [
            "doc_id", "actual_lang", "predicted_lang", "best_score", "script"
        ]
    evp = {r["doc_id"]: r["predicted_lang"] for r in ev.collect()}
    pp = {r["doc_id"]: r["predicted_lang"] for r in lang_id(df).collect()}
    assert evp == pp
    acc = sum(
        1 for r in ev.collect() if r["predicted_lang"] == r["actual_lang"]
    ) / len(truth)
    assert acc >= 0.9


def test_tie_break_is_language_code_order(spark):
    """Equal non-zero scores predict the alphabetically first language --
    deterministic across engines and runs."""
    from nreadspark.ops.textstats import lang_id

    # one de marker + one en marker, nothing else
    df = spark.createDataFrame([(1, "der fast zug")], "doc_id long, text string")
    (row,) = lang_id(df).collect()
    assert row["best_score"] == 1 and row["predicted_lang"] == "de"


def test_null_text_predicts_und_with_zero_score(spark):
    """NULL text makes regexp_extract_all NULL and F.size(NULL) -1; the
    score clamp must turn that into ('und', 0), matching the SQL twin."""
    from nreadspark.ops.textstats import lang_id

    df = spark.createDataFrame([(1, None), (2, "the cat and the dog")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in lang_id(df).collect()}
    assert out[1]["predicted_lang"] == "und" and out[1]["best_score"] == 0
    assert out[2]["predicted_lang"] == "en"


def test_single_pass_equals_per_language_scans(spark, monkeypatch):
    """The combined-alternation single scan (round 6) must yield exactly
    the per-language independent-scan scores -- forced fallback vs default
    path on a corpus with dense, adjacent, and cross-script markers."""
    import nreadspark.ops.textstats as T

    texts = [
        "the fast cat and the slow dog of the house",
        "el perro pero como una casa los dias",
        "der zug und die bahn ist nicht da",
        "di che per della sono di che",
        "это не как и что это не",
        "的是了在我的是了",
        "のはをですしたのは",
        "the der les di uma het и 的 の",  # one marker per language
        "",
        "no markers whatsoever xyzzy",
        "thethe andand derder",  # markers glued: \b must reject
        "ですしたのは das ist die der und",  # mixed scripts in one doc
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert T._single_pass_safe()
    fast = sorted(map(tuple, T.lang_id(df).collect()))
    monkeypatch.setattr(T, "_single_pass_safe", lambda: False)
    slow = sorted(map(tuple, T.lang_id(df).collect()))
    assert fast == slow


def test_single_pass_validator_rejects_unsafe_sets(monkeypatch):
    """Marker sets that would make the consuming scan observable must
    disable the optimization: same-language prefixes, cross-language
    duplicate markers, shared non-Latin character sets, regex metachars."""
    import nreadspark.ops.textstats as T

    base = {k: list(v) for k, v in T.LANG_MARKERS.items()}
    assert T._single_pass_safe()

    unsafe = {**base, "ja": base["ja"] + ["です、"]}  # "です" prefix of "です、"
    monkeypatch.setattr(T, "LANG_MARKERS", unsafe)
    assert not T._single_pass_safe()

    dup = {**base, "es": base["es"][:-1] + ["the"]}  # duplicate of en marker
    monkeypatch.setattr(T, "LANG_MARKERS", dup)
    assert not T._single_pass_safe()

    shared = {**base, "zh": base["zh"][:-1] + ["のだ"]}  # shares chars with ja
    monkeypatch.setattr(T, "LANG_MARKERS", shared)
    assert not T._single_pass_safe()

    meta = {**base, "en": base["en"][:-1] + ["a.b"]}  # regex metachar
    monkeypatch.setattr(T, "LANG_MARKERS", meta)
    assert not T._single_pass_safe()


def test_split_scan_path_equals_per_language_regex(spark):
    """The regex-free scoring path (token-split Latin + literal-replace
    non-Latin) must equal independent per-language regexp scans -- the
    exact semantics the generated DuckDB oracle runs -- on adversarial
    inputs: markers inside longer words, punctuation/digit adjacency,
    mixed scripts in one document, empty and NULL text."""
    from pyspark.sql import Row, functions as F
    from nreadspark.ops.textstats import (
        LANG_MARKERS,
        _split_scan_safe,
        lang_id,
        lang_pattern,
    )

    assert _split_scan_safe()  # the shipped marker set must stay on it
    texts = [
        "the theatre of android bandand the-of.and,fast_slow fast9 _the the",
        "el los losuna pero, como-el una.pero elche",
        "und der derdie nicht9 ist_die die der und und",
        "и не чточто этокак какэто не иис",
        "的是了在我 的的的 是了 在我的x是",
        "のはをですしたのしたです。はを のです",
        "mixed: the und el и 的 の です fast ist niet zijn",
        "ที่ในของและการ และ ที่ การx",
        "في من على أن هذا في-من",
        "no markers here at all: zzz qqq 123",
        "",
        None,
        "the" * 50 + " the and " + "的" * 30,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["predicted_lang"], r["best_score"])
        for r in lang_id(df).collect()
    }
    # reference: independent per-language regex scans (the oracle form)
    langs = sorted(LANG_MARKERS.keys())
    ref_scored = df.select(
        "doc_id",
        *[
            F.greatest(
                F.size(
                    F.regexp_extract_all(F.col("text"), F.lit(lang_pattern(l)), 0)
                ),
                F.lit(0),
            ).alias(f"score_{l}")
            for l in langs
        ],
    )
    for r in ref_scored.collect():
        best = max(r[f"score_{l}"] for l in langs)
        pred = "und" if best == 0 else next(
            l for l in langs if r[f"score_{l}"] == best
        )
        assert got[r["doc_id"]] == (pred, best), (
            r["doc_id"],
            texts[r["doc_id"]],
            got[r["doc_id"]],
            (pred, best),
        )


def test_script_family_histogram(spark):
    """The r8 script column: dominant Unicode family per doc, computed by
    removal arithmetic -- out-of-marker-set languages stop being an
    opaque 'und' (e.g. Vietnamese -> latin, Ukrainian -> cyrillic), ties
    break on family name, letter-free docs stay 'und'."""
    from nreadspark.ops.textstats import lang_id

    rows = [
        (0, "Xin chào các bạn hôm nay trời đẹp"),      # Vietnamese: latin
        (1, "Привіт усім як справи сьогодні"),          # Ukrainian: cyrillic
        (2, "שלום לכולם מה שלומכם היום"),               # Hebrew
        (3, "こんにちは皆さん元気ですか"),                 # kana + han mix
        (4, "1234 ... !!!"),                            # no letters -> und
        (5, "hello κόσμος"),                            # latin 5 vs greek 6
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["script"] for r in lang_id(df).collect()}
    assert out[0] == "latin"
    assert out[1] == "cyrillic"
    assert out[2] == "hebrew"
    assert out[3] in ("kana", "han")
    assert out[4] == "und"
    assert out[5] == "greek"   # 6 greek letters beat 5 latin
    assert out[6] == "und"
