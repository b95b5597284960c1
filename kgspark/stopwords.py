"""Per-language stopword data (S11) + language-marker sets.

The reference ships per-language stopword lists harvested from DBpedia
Spotlight's public model-quickstarter repo (``data/stopwords.RData``,
``data-raw/stopwords.R:1-24``) and removes them from the decodable token
stream before annotation (``R/dbpedia.R:798-811``). These lists are the
standard common-function-word sets for each language (public knowledge;
same provenance idea as the model-quickstarter's ``stopwords.list``),
substantive enough for S3 decode parity and crawl-scale quality scoring —
not the 9-word toy list of round 1.

``LANG_MARKERS`` are hand-picked, *pairwise-disjoint* subsets used by the
language-ID operator: disjointness keeps the marker-count argmax
discriminative (a shared word like 'la' would count for es AND fr).
"""

from __future__ import annotations

STOPWORDS: dict[str, list[str]] = {
    "en": [
        "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
        "for", "with", "by", "from", "up", "about", "into", "over", "after",
        "is", "are", "was", "were", "be", "been", "being", "am", "do", "does",
        "did", "have", "has", "had", "will", "would", "can", "could", "shall",
        "should", "may", "might", "must", "it", "its", "this", "that", "these",
        "those", "he", "she", "they", "we", "you", "i", "his", "her", "their",
        "our", "your", "my", "me", "him", "them", "us", "who", "whom", "which",
        "what", "where", "when", "why", "how", "all", "any", "both", "each",
        "few", "more", "most", "other", "some", "such", "no", "nor", "not",
        "only", "own", "same", "so", "than", "too", "very", "just", "there",
        "here", "then", "once", "as", "if", "because", "while", "during",
    ],
    "de": [
        "der", "die", "das", "den", "dem", "des", "ein", "eine", "einer",
        "eines", "einem", "einen", "und", "oder", "aber", "auch", "auf",
        "aus", "bei", "bis", "durch", "für", "gegen", "ohne", "um", "an",
        "am", "im", "in", "mit", "nach", "seit", "von", "vor", "zu", "zur",
        "zum", "ist", "sind", "war", "waren", "sein", "bin", "bist", "wird",
        "werden", "wurde", "wurden", "hat", "haben", "hatte", "hatten",
        "kann", "können", "muss", "müssen", "soll", "sollen", "will",
        "wollen", "nicht", "kein", "keine", "ich", "du", "er", "sie", "es",
        "wir", "ihr", "mich", "dich", "sich", "uns", "euch", "mein", "dein",
        "was", "wer", "wie", "wo", "wann", "warum", "dass", "weil", "wenn",
        "als", "noch", "schon", "nur", "sehr", "hier", "dort", "dann", "denn",
    ],
    "es": [
        "el", "la", "los", "las", "un", "una", "unos", "unas", "y", "o",
        "pero", "de", "del", "a", "al", "en", "con", "por", "para", "sin",
        "sobre", "entre", "hasta", "desde", "es", "son", "era", "eran",
        "ser", "estar", "está", "están", "estaba", "fue", "fueron", "ha",
        "han", "había", "habían", "puede", "pueden", "debe", "deben", "no",
        "ni", "sí", "yo", "tú", "él", "ella", "ellos", "ellas", "nosotros",
        "usted", "me", "te", "se", "nos", "le", "les", "lo", "mi", "tu",
        "su", "sus", "que", "qué", "quien", "cual", "como", "cómo", "donde",
        "cuando", "porque", "si", "más", "menos", "muy", "ya", "también",
        "todo", "toda", "todos", "todas", "otro", "otra", "este", "esta",
        "ese", "esa", "aquel",
    ],
    "fr": [
        "le", "la", "les", "un", "une", "des", "du", "de", "d", "l", "et",
        "ou", "mais", "à", "au", "aux", "en", "dans", "sur", "sous", "avec",
        "sans", "pour", "par", "vers", "chez", "entre", "est", "sont",
        "était", "étaient", "être", "été", "suis", "es", "sera", "seront",
        "a", "ont", "avait", "avaient", "avoir", "eu", "peut", "peuvent",
        "doit", "doivent", "ne", "pas", "non", "je", "tu", "il", "elle",
        "ils", "elles", "nous", "vous", "on", "me", "te", "se", "lui",
        "leur", "y", "mon", "ton", "son", "ma", "ta", "sa", "mes", "tes",
        "ses", "notre", "votre", "que", "qui", "quoi", "dont", "où", "quand",
        "comment", "pourquoi", "si", "plus", "moins", "très", "aussi",
        "tout", "toute", "tous", "toutes", "autre", "ce", "cette", "ces",
        "cela", "ça",
    ],
    "it": [
        "il", "lo", "la", "i", "gli", "le", "un", "uno", "una", "e", "o",
        "ma", "di", "del", "della", "dei", "delle", "a", "al", "alla", "in",
        "nel", "nella", "con", "su", "sul", "sulla", "per", "tra", "fra",
        "è", "sono", "era", "erano", "essere", "stato", "ha", "hanno",
        "aveva", "avere", "può", "possono", "deve", "devono", "non", "né",
        "io", "tu", "lui", "lei", "noi", "voi", "loro", "mi", "ti", "si",
        "ci", "vi", "mio", "tuo", "suo", "che", "chi", "cui", "come",
        "dove", "quando", "perché", "se", "più", "meno", "molto", "anche",
        "tutto", "tutti", "altro", "questo", "quello", "questa", "quella",
    ],
    "pt": [
        "o", "a", "os", "as", "um", "uma", "uns", "umas", "e", "ou", "mas",
        "de", "do", "da", "dos", "das", "em", "no", "na", "nos", "nas",
        "com", "por", "para", "sem", "sobre", "entre", "até", "desde", "é",
        "são", "era", "eram", "ser", "estar", "está", "estão", "foi",
        "foram", "tem", "têm", "tinha", "tinham", "pode", "podem", "deve",
        "devem", "não", "nem", "sim", "eu", "tu", "ele", "ela", "eles",
        "elas", "nós", "vós", "você", "me", "te", "se", "lhe", "lhes",
        "meu", "teu", "seu", "minha", "sua", "que", "quem", "qual", "onde",
        "quando", "porque", "como", "mais", "menos", "muito", "já",
        "também", "todo", "toda", "todos", "outro", "este", "esta", "esse",
        "essa", "aquele",
    ],
    "nl": [
        "de", "het", "een", "en", "of", "maar", "van", "in", "op", "aan",
        "bij", "met", "naar", "uit", "over", "onder", "tussen", "voor",
        "door", "zonder", "is", "zijn", "was", "waren", "ben", "bent",
        "wordt", "worden", "werd", "werden", "heeft", "hebben", "had",
        "hadden", "kan", "kunnen", "moet", "moeten", "zal", "zullen",
        "niet", "geen", "ik", "jij", "hij", "zij", "wij", "jullie", "u",
        "mij", "jou", "zich", "ons", "hun", "mijn", "jouw", "wat", "wie",
        "welke", "waar", "wanneer", "waarom", "hoe", "dat", "dit", "deze",
        "die", "omdat", "als", "dan", "nog", "al", "ook", "zeer", "hier",
        "daar", "er", "te", "om",
    ],
    # romanized marker vocabulary (the engine treats zh as
    # whitespace-tokenized pinyin in the synthetic corpus; a real deployment
    # plugs a CJK tokenizer in upstream of these operators)
    "zh": ["de", "le", "shi", "wo", "bu", "zai", "ta", "men", "zhe", "na",
           "you", "he", "jiu", "dou", "yao", "ni", "hui", "dui", "neng", "hao"],
}


def stopwords_for(lang: str) -> list[str]:
    """Per-language stoplist; falls back to English (the reference indexes
    its list by the ``language`` argument, R/dbpedia.R:1385-1399)."""
    return STOPWORDS.get(lang, STOPWORDS["en"])


# Pairwise-disjoint marker subsets for language ID (argmax counting).
# Hand-picked from the stoplists above: words distinctive to one language.
# ('the'/'a' are deliberately absent from the en set: they collide with the
# synthetic corpus vocabulary and would swamp the argmax.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["and", "of", "with", "this", "that", "have", "from",
           "they", "which", "would", "there", "when"],
    "de": ["und", "der", "das", "nicht", "ein", "eine", "ist", "mit",
           "auch", "werden", "für", "dass"],
    "es": ["los", "las", "una", "para", "como", "pero", "este", "ser",
           "entre", "cuando", "también", "porque"],
    "fr": ["les", "des", "une", "dans", "avec", "pour", "est", "sont",
           "cette", "mais", "être", "aussi"],
    "zh": ["shi", "wo", "zai", "men", "zhe", "jiu", "dou", "yao",
           "neng", "hao", "hui", "dui"],
}

_flat = [w for ms in LANG_MARKERS.values() for w in ms]
assert len(_flat) == len(set(_flat)), "LANG_MARKERS must be pairwise disjoint"
