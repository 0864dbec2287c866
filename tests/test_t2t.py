"""T2T tests: number normalization, sentence ops, translator chaining."""

from infernos_tpu.t2t import NumbersToWords, Translator, sent_split, regroup_sentences
from infernos_tpu.t2t.numbers import number_to_words
from infernos_tpu.t2t.translator import EchoBackend, get_translator


def test_number_to_words():
    assert number_to_words("0") == "zero"
    assert number_to_words("15") == "fifteen"
    assert number_to_words("42") == "forty-two"
    assert number_to_words("123") == "one hundred and twenty-three"
    assert number_to_words("1000") == "one thousand"
    assert number_to_words("1234") == "one thousand two hundred and thirty-four"
    assert number_to_words("3.5") == "three point five"
    assert number_to_words("1,200") == "one thousand two hundred"


def test_numbers_to_words_in_text():
    n2w = NumbersToWords()
    assert n2w("I have 3 cats and 12 dogs.") == "I have three cats and twelve dogs."
    assert n2w("Interest is 5% now.") == "Interest is five percent now."
    assert n2w("Call me at 7.") == "Call me at seven."


def test_numbers_translation_cached():
    calls = []

    def fake_tr(w):
        calls.append(w)
        return f"XX{w}XX"

    n2w = NumbersToWords(lang="de", translate=fake_tr)
    n2w("There are 7 days. And again 7 days.")
    assert calls == ["seven"]  # second occurrence hits the cache


def test_sent_split():
    s = sent_split("Hello there. How are you? Fine! Dr. Smith agrees.")
    assert s == ["Hello there.", "How are you?", "Fine!", "Dr. Smith agrees."]


def test_regroup():
    groups = regroup_sentences(["short.", "also short.", "x" * 120], max_chars=30)
    assert groups[0] == "short. also short."
    assert groups[1] == "x" * 120


def test_translator_direct_and_pivot():
    class SparseBackend(EchoBackend):
        def pairs(self):
            return [("en", "de"), ("de", "ja")]

    t = Translator("en", "de", backend=SparseBackend())
    assert t.translate("hi") == "[en->de] hi"
    # en->ja has no direct pair; must pivot through de
    t2 = Translator("en", "ja", backend=SparseBackend())
    assert t2.translate("hi") == "[de->ja] [en->de] hi"
    try:
        Translator("ja", "en", backend=SparseBackend())
        assert False
    except ValueError:
        pass


def test_get_translator_cached():
    a = get_translator("en", "pt")
    b = get_translator("en", "pt")
    assert a is b
