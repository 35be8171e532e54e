"""Tokenizer + offset-map golden tests (the byte-identity surface)."""

from qizner_spark.core.tokenize import (
    UNK,
    ZH_SPACE,
    SimpleWordPiece,
    mentions_to_raw,
    tokenize_words,
    zh_char_tokenize,
    zheng_process,
)


class TestZhCharTokenize:
    def test_basic(self):
        assert zh_char_tokenize("中 文") == ["中", ZH_SPACE, "文"]

    def test_oov(self):
        assert zh_char_tokenize("中X", vocab={"中"}) == ["中", UNK]


class TestSimpleWordPiece:
    def test_word_split(self):
        t = SimpleWordPiece(piece=4)
        assert t.tokenize_word("Austria") == ["Aust", "##ria"]
        assert t.tokenize_word("hi") == ["hi"]
        assert t.tokenize_word(" ") == []

    def test_cap_five_subtokens(self):
        t = SimpleWordPiece(piece=2)
        subs, oris = tokenize_words(["aaaaaaaaaaaaaaaaaaaa"], t)  # 10 pieces -> capped
        assert len(subs) == 5
        assert oris == [0] * 5

    def test_empty_word_becomes_unk(self):
        subs, oris = tokenize_words(["ok", " "], SimpleWordPiece())
        assert subs == ["ok", UNK]
        assert oris == [0, 1]

    def test_encode_raw_offsets(self):
        t = SimpleWordPiece(piece=4)
        subs, offs = t.encode_raw("ab 中文")
        assert subs == ["ab", "中", "文"]
        assert offs == [(0, 2), (3, 4), (4, 5)]

    def test_encode_raw_subword_offsets(self):
        t = SimpleWordPiece(piece=2)
        subs, offs = t.encode_raw("abcde")
        assert subs == ["ab", "##cd", "##e"]
        assert offs == [(0, 2), (2, 4), (4, 5)]


class TestZhengProcess:
    def test_raw_text_preserved_verbatim(self):
        raw = " 备受 CHINA 瞩目 "
        res = zheng_process(raw)
        assert res.raw_text == raw  # byte identity (datautils.py:3099-3101)

    def test_mixed_zh_en(self):
        t = SimpleWordPiece(piece=2)
        res = zheng_process("中文 DEFEAT,玩家", tokenizer=t)
        # DEFEAT -> DE ##FE ##AT merged back into one token
        assert res.tokens == ["中", "文", "DEFEAT", ",", "玩", "家"]
        assert res.sub_tokens == ["中", "文", "DE", "##FE", "##AT", ",", "玩", "家"]
        assert res.ori_indexes == [0, 1, 2, 2, 2, 3, 4, 5]

    def test_raw2char_skips_whitespace(self):
        res = zheng_process("ab cd", tokenizer=SimpleWordPiece(piece=4))
        # tokens: [ab, cd]; raw offset 2 (the space) back-fills to the
        # NEXT token (index 1), reference right-fill (datautils.py:3144-3146)
        assert res.raw2char == [0, 0, 1, 1, 1]
        assert res.char2raw == {0: 0, 1: 2, 2: 5}

    def test_leading_space_maps_to_first_token(self):
        res = zheng_process(" ab", tokenizer=SimpleWordPiece())
        assert res.raw2char == [0, 0, 0]
        assert res.char2raw == {0: 0, 1: 3}

    def test_entity_remap_simple(self):
        # entity 'cd' at raw (3,5) -> token 1
        res = zheng_process("ab cd", [("X", 3, 5)], tokenizer=SimpleWordPiece())
        assert res.mentions == [("X", 1, 2)]

    def test_entity_at_raw_eos(self):
        res = zheng_process("ab cd", [("X", 0, 5)], tokenizer=SimpleWordPiece())
        # end == len(raw) -> raw2char[end-1]+1 (datautils.py:3166-3167)
        assert res.mentions == [("X", 0, 2)]

    def test_entity_collapsed_into_token_gets_plus_one(self):
        # '280' inside '280000': both offsets map to the same token ->
        # new_end == new_start -> +1 (datautils.py:3170-3171)
        res = zheng_process("280000", [("NUM", 0, 3)], tokenizer=SimpleWordPiece(piece=6))
        assert res.mentions == [("NUM", 0, 1)]

    def test_roundtrip_to_raw(self):
        raw = "Arsenal beat 曼联 2-1"
        res = zheng_process(raw, tokenizer=SimpleWordPiece(piece=4))
        # token span of '曼联' -> raw offsets
        i = res.tokens.index("曼")
        back = mentions_to_raw([("ORG", i, i + 2)], res.char2raw)
        (t, s, e) = back[0][:3]
        # reference char2raw keeps the FIRST raw offset per token and
        # back-fills skipped whitespace onto the following token
        # (datautils.py:3144-3156), so the restored span includes the
        # preceding space
        assert raw[s:e].strip() == "曼联"

    def test_docstring_example_shape(self):
        """The reference docstring example (datautils.py:3088-3122)
        reproduced with the stub tokenizer: token merge + ori_indexes
        monotonicity + full raw coverage."""
        raw = " 备受“瞩目”的《迷失》CHINA IN SURPRISE DEFEAT,玩家的魔兽"
        res = zheng_process(raw, tokenizer=SimpleWordPiece(piece=2))
        assert res.raw_text == raw
        assert "".join(res.tokens).replace("##", "") == raw.replace(" ", "")
        assert res.ori_indexes == sorted(res.ori_indexes)
        assert len(res.raw2char) == len(raw)
        assert all(isinstance(i, int) for i in res.raw2char)
        assert res.char2raw[len(res.tokens)] == len(raw)

    def test_empty_text(self):
        res = zheng_process("")
        assert res.tokens == [] and res.mentions == []


class TestDetectMentionsRaw:
    def test_raw_offsets_slice_back_to_surface(self, spark):
        """T4/D8 through the Arrow operator: raw offsets restored by
        mentions_to_raw must slice the VERBATIM raw string back to the
        detected surface (plus the reference's leading-separator
        convention for non-initial tokens)."""
        from qizner_spark.operators.mentions import detect_mentions_raw

        def factory():
            from qizner_spark.core.scoring import GazetteerScorer
            from qizner_spark.gazetteer import GAZETTEER_SINGLE

            return GazetteerScorer(GAZETTEER_SINGLE, token_deli=" ")

        docs = spark.createDataFrame(
            [(1, "hash join beats sort"), (2, "the spark table scan")],
            ["doc_id", "text"],
        )
        rows = detect_mentions_raw(docs, factory).collect()
        texts = {1: "hash join beats sort", 2: "the spark table scan"}
        assert len(rows) >= 5
        for r in rows:
            text = texts[int(r["doc_key"])]
            assert text[r["raw_start"]:r["raw_end"]] == r["raw_slice"]
            # reference convention: dropped whitespace back-fills from
            # the RIGHT, so non-initial tokens carry their LEADING
            # separator in the raw span
            assert r["raw_slice"].lstrip(" ") == r["mention"]
        firsts = [r for r in rows if r["raw_start"] == 0]
        assert all(r["raw_slice"] == r["mention"] for r in firsts)
        assert any(r["raw_slice"] != r["mention"] for r in rows)
