"""Long-text synthesis: sentence segmentation + batched stitching
(utils/text.py, TTSEngine.synthesize_long). The reference truncates
long text to one bounded request (MAX_TOKENS=200,
llamacpp_talker_server.py:65); here paragraphs split into sentences and
decode in batched groups."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.utils.text import split_for_budget, split_sentences


def test_split_keeps_delimiters_and_order():
    s = split_sentences("Привет, мир! Как дела? Хорошо. Да")
    assert s == ["Привет, мир!", "Как дела?", "Хорошо.", "Да"]


def test_split_cjk_and_ellipsis():
    s = split_sentences("你好。天气很好!Ну что ж… продолжим.")
    assert s[0] == "你好。"
    assert s[-1] == "продолжим."
    assert any(p.endswith("…") for p in s)


def test_split_newlines_are_hard_boundaries():
    s = split_sentences("первая строка без точки\nвторая строка")
    assert s == ["первая строка без точки", "вторая строка"]


def test_split_bounded_pieces():
    long_sentence = ("очень " * 30 + "длинное предложение, "
                     + "с запятой, " * 10 + "и точкой в конце.")
    pieces = split_sentences(long_sentence, max_chars=48)
    assert len(pieces) > 1
    assert all(len(p) <= 48 for p in pieces)
    # nothing lost: the concatenation covers every non-space char
    assert ("".join(pieces)).replace(" ", "") == \
        long_sentence.replace(" ", "")


def test_split_hard_cut_unbreakable_run():
    pieces = split_sentences("x" * 100, max_chars=32)
    assert all(len(p) <= 32 for p in pieces)
    assert "".join(pieces) == "x" * 100


def _bpe_like(s: str) -> int:
    # a realistic BPE rate for Russian/English: ~0.4 tokens per char
    return max(1, int(len(s) * 0.4))


def _byte_count(s: str) -> int:
    return len(s.encode("utf-8"))


def test_budget_split_no_oversplit_normal_sentences():
    """A normal sentence that fits the token budget stays whole — the
    char-based bound (max_tokens//6 chars) used to chop every 60-100
    char sentence into ~33-char fragments."""
    text = ("Сегодня прекрасная погода, и мы отправились гулять в парк. "
            "Дети играли на площадке около большого старого дуба.")
    # default cap 200 -> budget 33 tokens; both sentences are ~45-60
    # chars -> ~18-24 BPE tokens: each fits, and the pair merges
    pieces = split_for_budget(text, _bpe_like, 33)
    assert all(_bpe_like(p) <= 33 for p in pieces)
    assert len(pieces) <= 2
    joined = " ".join(pieces)
    assert joined.replace(" ", "") == text.replace(" ", "")


def test_budget_split_merges_short_sentences():
    text = "Да. Нет. Может быть. Конечно."
    pieces = split_for_budget(text, _bpe_like, 33)
    assert len(pieces) == 1   # all four merge within the budget
    assert split_for_budget(text, _bpe_like, 33, merge=False) == \
        split_sentences(text)


def test_budget_split_multibyte_never_exceeds_budget():
    """Under byte-fallback tokenization multi-byte scripts encode to
    SEVERAL tokens per char — a char bound under-splits and the decode
    truncates mid-sentence. The token bound cannot."""
    text = "Это очень длинное предложение на кириллице без знаков, " * 4
    for budget in (12, 33, 64):
        pieces = split_for_budget(text.strip(), _byte_count, budget)
        assert all(_byte_count(p) <= budget for p in pieces)
        assert ("".join(pieces)).replace(" ", "") == \
            text.strip().replace(" ", "")


def test_budget_split_hard_cut_giant_word():
    word = "щ" * 300   # 600 bytes, no split points
    pieces = split_for_budget(word, _byte_count, 40)
    assert all(_byte_count(p) <= 40 for p in pieces)
    assert "".join(pieces) == word


@pytest.fixture(scope="module")
def engine():
    return TTSEngine(tiny_tts_config(max_tokens=8), model_dir=None,
                     dtype=jnp.float32)


def test_synthesize_long_stitches_in_order(engine):
    text = "Раз два три. Четыре пять! Шесть семь? Восемь девять."
    chunks = []
    res = engine.synthesize_long(text, language="russian", seed=5,
                                 max_batch=2, on_chunk=chunks.append)
    assert res.n_tokens > 0
    assert len(res.audio_int16) == res.n_tokens * 1920
    assert res.codes.shape == (res.n_tokens, 16)
    # on_chunk emissions concatenate to the full audio, in order
    np.testing.assert_array_equal(np.concatenate(chunks), res.audio_int16)
    # one emission per split piece (pieces are bounded by ENCODED token
    # count against the decode budget, so none of the text is silently
    # dropped by the EOS-pacing cap — with this tiny max_tokens=8 config
    # that means many small pieces)
    budget = max(2, (engine.cfg.max_tokens - 1) // 6)
    exp = split_for_budget(
        text, lambda s: len(engine.tokenizer.encode(s)), budget)
    # the FIRST piece streams through the head schedule (>= 1 frame, low
    # first-audio latency); every later piece emits exactly one frame
    assert len(chunks) >= len(exp) > len(split_sentences(text))
    # deterministic for a fixed seed
    res2 = engine.synthesize_long(text, language="russian", seed=5,
                                  max_batch=2)
    np.testing.assert_array_equal(res.audio_int16, res2.audio_int16)


def test_synthesize_long_single_piece_passthrough(engine):
    # a text that fits this tiny config's 2-token split budget passes
    # through to plain synthesize() unchanged (with the default
    # max_tokens=200 the budget is 33 tokens — a full sentence)
    res_long = engine.synthesize_long("Я", language="russian", seed=3)
    res = engine.synthesize("Я", language="russian", seed=3)
    np.testing.assert_array_equal(res_long.audio_int16, res.audio_int16)


def test_synthesize_long_covers_all_text_despite_tiny_cap(engine):
    """With max_tokens=8 a direct synthesize() of a 19-token text is
    EOS-pacing-truncated; synthesize_long splits by encoded token count
    so every piece decodes un-truncated — the stitched audio covers
    more of the text than the single capped request can."""
    res_long = engine.synthesize_long("Одна фраза", language="russian",
                                      seed=3)
    res = engine.synthesize("Одна фраза", language="russian", seed=3)
    assert res.n_tokens <= engine.cfg.max_tokens
    assert res_long.n_tokens > res.n_tokens


def test_synthesize_long_rejects_bad_language(engine):
    with pytest.raises(ValueError, match="unsupported language"):
        engine.synthesize_long("Текст. Ещё текст.", language="klingon")


def test_daemon_long_engine_and_batched(engine, tmp_path):
    """"long": true over the wire — engine mode (synthesize_long) and
    batched mode (sentences decode concurrently as individual slots);
    stream mode emits one frame per finished sentence, in order."""
    import os
    import threading
    import time

    from qwen3_tts_tpu.serve.batching import ContinuousBatcher
    from qwen3_tts_tpu.serve.daemon import DaemonClient, TTSDaemon

    text = "Раз два. Три четыре! Пять шесть?"
    # pieces are bounded by encoded token count against the decode
    # budget (the daemon mirrors engine.synthesize_long's split rule)
    budget = max(2, (engine.cfg.max_tokens - 1) // 6)
    n_sent = len(split_for_budget(
        text, lambda s: len(engine.tokenizer.encode(s)), budget))

    # engine mode
    sock = str(tmp_path / "tts_long_e.sock")
    d = TTSDaemon(engine, sock)
    t = threading.Thread(target=d.serve, kwargs={"native_loop": False},
                         daemon=True)
    t.start()
    while not os.path.exists(sock):
        time.sleep(0.05)
    try:
        cl = DaemonClient(sock)
        hdr, audio = cl.synthesize(text, language="russian", seed=7,
                                   long=True)
        ref = engine.synthesize_long(text, language="russian", seed=7)
        np.testing.assert_array_equal(audio, ref.audio_int16)
        assert hdr["n_tokens"] == ref.n_tokens
        # stream mode: the first sentence streams through the head
        # schedule (>= 1 frame), later sentences one frame each
        frames = []
        hdr_s, audio_s = cl.synthesize(text, language="russian", seed=7,
                                       long=True, stream=True,
                                       on_chunk=lambda h, a: frames.append(a))
        np.testing.assert_array_equal(audio_s, ref.audio_int16)
        assert len([f for f in frames if len(f)]) >= n_sent
    finally:
        d.stop()
        t.join(timeout=10)

    # batched mode: sentences share the decode batch
    sock_b = str(tmp_path / "tts_long_b.sock")
    batcher = ContinuousBatcher(engine.cfg, engine.params, batch_size=2,
                                decode_chunk=4, dtype=jnp.float32)
    db = TTSDaemon(engine, sock_b, batcher=batcher)
    tb = threading.Thread(target=db.serve, daemon=True)
    tb.start()
    while not os.path.exists(sock_b):
        time.sleep(0.05)
    try:
        cl = DaemonClient(sock_b)
        hdr_b, audio_b = cl.synthesize(text, language="russian", seed=7,
                                       long=True)
        assert hdr_b["n_sentences"] == n_sent
        assert hdr_b["n_tokens"] > 0
        assert len(audio_b) == hdr_b["n_samples"] == hdr_b["n_tokens"] * 1920
        s = cl.stats()
        assert s["requests"] >= 1
    finally:
        db.stop()
        tb.join(timeout=10)


def test_split_preserves_user_punctuation():
    """Leading ellipses attach to the following sentence and
    delimiter-only lines survive — nothing the user wrote is silently
    dropped (review finding)."""
    from qwen3_tts_tpu.utils.text import split_sentences

    assert split_sentences("...wait what. ok.") == ["...wait what.", "ok."]
    assert split_sentences("!!!") == ["!!!"]


def test_split_for_budget_keeps_newline_boundaries():
    """The greedy merge must not re-join pieces across newlines (hard
    prosodic boundaries; review finding)."""
    from qwen3_tts_tpu.utils.text import split_for_budget

    got = split_for_budget("line one\nline two", lambda s: len(s.split()), 10)
    assert got == ["line one", "line two"]
    # merge still packs within a line
    got = split_for_budget("a b. c d.", lambda s: len(s.split()), 10)
    assert got == ["a b. c d."]
