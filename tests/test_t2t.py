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


def test_llm_backend_through_real_engine():
    """Weak-8 fix: the production LLMBackend wired to a live tiny LLMActor
    (real generation through the engine, not EchoBackend)."""
    from infernos_tpu.cluster.actors import spawn
    from infernos_tpu.cluster.model_actors import LLMActor
    from infernos_tpu.t2t.translator import Translator, llm_backend_from_actor

    h = spawn(LLMActor, tiny=True, name="llm:t2t-test")
    try:
        h.ask_sync("start", timeout=600)
        backend = llm_backend_from_actor(h, timeout=120.0)
        t = Translator("en", "pt", backend=backend)
        out = t.translate("hello world")
        # tiny random weights: the content is noise, but the call must round-
        # trip through prompt templating -> engine -> sentence streamer
        assert isinstance(out, str)
        # a second translation must also work (fresh one-shot session)
        out2 = t.translate("good morning")
        assert isinstance(out2, str)
    finally:
        h.stop()
