"""Tokenizer + Porter stemmer parity fixtures (SURVEY.md §5.1, FIXTURES.md §5)."""

from collections import Counter

from search_engine_spark.porter import porter_stem
from search_engine_spark.stopwords import NLTK_ENGLISH_STOPWORDS, STOPWORDS
from search_engine_spark.tokenizer import TOKEN_RE, extract_query_words, tokenize

# (word -> stem) pairs matching NLTK PorterStemmer (NLTK_EXTENSIONS mode).
PORTER_FIXTURES = {
    # irregular pool
    "sky": "sky",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "news": "news",
    "innings": "inning",
    "proceed": "proceed",
    "exceed": "exceed",
    "succeed": "succeed",
    # short words unchanged
    "a": "a",
    "is": "is",
    "be": "be",
    # step 1a
    "caresses": "caress",
    "ponies": "poni",
    "ties": "tie",  # nltk ext: 4-letter ies -> ie
    "dies": "die",  # pool
    "flies": "fli",
    "caress": "caress",
    "cats": "cat",
    # step 1b
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "studied": "studi",  # nltk ext ied -> i
    "tied": "tie",  # nltk ext 4-letter ied -> ie
    # step 1c
    "happy": "happi",
    "cry": "cri",
    "say": "say",
    "enjoy": "enjoy",
    "by": "by",
    # step 2
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # general words common in corpora
    "running": "run",
    "engines": "engin",
    "searching": "search",
    "documents": "document",
    "quickly": "quickli",
    "generalization": "gener",
    "university": "univers",
    "computation": "comput",
}


def test_porter_fixture_pairs():
    errors = {w: (porter_stem(w), want) for w, want in PORTER_FIXTURES.items() if porter_stem(w) != want}
    assert not errors, f"stem mismatches: {errors}"


def test_stopword_list_size_and_members():
    assert len(NLTK_ENGLISH_STOPWORDS) == 179
    assert len(STOPWORDS) == 179
    # contraction fragments must be present — they affect tokenization
    for w in ("don", "won", "ll", "re", "ve", "ain", "shan", "ma"):
        assert w in STOPWORDS


def test_tokenize_semantics():
    # lowercase -> regex [a-zA-Z0-9]{2,} -> stopword filter -> stem -> Counter
    c = tokenize("The RUNNING engines are running, running!")
    assert c == Counter({"run": 3, "engin": 1})
    # single chars dropped by the regex; stopwords dropped before stemming
    assert tokenize("a I x don't won't") == Counter()
    # numbers >= 2 digits are tokens
    assert tokenize("42 7 spark") == Counter({"42": 1, "spark": 1})
    # empty/None-ish
    assert tokenize("") == Counter()


def test_tokenize_stopwords_before_stemming():
    # "having" is a stopword (dropped); "haves" stems to "have" and survives
    assert "have" not in tokenize("having")
    assert tokenize("haves")["have"] == 1


def test_extract_query_words_order_and_dedup():
    ws = extract_query_words("Spark the spark ENGINE spark engine")
    assert ws == ["spark", "engine"]


def test_token_regex_word_boundaries():
    assert TOKEN_RE.findall("ab-cd ef") == ["ab", "cd", "ef"]
    assert TOKEN_RE.findall("x y") == []
