import numpy as np
import pytest

from veritasfi_tpu.retrieval.memory_bank import (
    MemoryBank,
    MemoryBankBM25,
    normalize_question,
    periods_to_dict,
)


@pytest.fixture
def bank(tmp_path):
    db = str(tmp_path / "frequent_qa.db")
    table = str(tmp_path / "qa_table.db")
    MemoryBank.create_db(db, [
        {"question": "极氪的毛利率是多少?",
         "question_rewritten": "What is the gross margin of Zeekr in 2024?",
         "answer": "The gross margin was 13%."},
        {"question": "Who are the board members?",
         "question_rewritten": "Who are the board members of Zeekr?",
         "answer": "The board includes An Conghui."},
        {"question": "inactive", "question_rewritten": "inactive question",
         "answer": "hidden", "is_active": False},
    ])
    MemoryBank.create_table_db(table, [
        {"question": "store count", "question_rewritten":
         "How many Zeekr stores are there?", "Y2023_FY": "300",
         "Y2024_Q3": "400"},
    ], period_columns=["Y2023_FY", "Y2024_Q3"])
    return MemoryBank(db, table)


def test_normalize_strips_company():
    q = normalize_question("What is Zeekr's margin?")
    assert "zeekr" not in q.lower()


def test_sequence_matcher_db(bank):
    res = bank.find_similar_questions_db(
        "What is the gross margin of Zeekr in 2024?", top_n=3, threshold=0.55)
    assert res and res[0][3] == "The gross margin was 13%."
    assert res[0][4] >= 0.99  # near-identical after normalization


def test_inactive_rows_excluded(bank):
    res = bank.find_similar_questions_db("inactive question", top_n=5,
                                         threshold=0.1)
    assert all(r[1] != "inactive" for r in res)


def test_bm25_db_threshold(bank):
    # with a 2-row bank, idf is tiny, so use a mechanics-level threshold
    # (the production 3.0 default assumes a large bank; tested in config)
    res = bank.find_similar_questions_bm25_db(
        "gross margin 2024?", top_n=3, threshold=0.2)
    assert res and res[0][3] == "The gross margin was 13%."
    # unrelated query scores below threshold
    assert bank.find_similar_questions_bm25_db(
        "weather Paris", top_n=3, threshold=0.2) == []


def test_table_matchers_unpivot(bank):
    res = bank.find_similar_questions_table(
        "How many Zeekr stores are there?", top_n=3, threshold=0.55)
    assert res and res[0][3] == {"Y2023_FY": "300", "Y2024_Q3": "400"}
    # single-row table: all idf values are negative (log(0.5/1.5 + eps)),
    # so use a negative threshold to exercise the mechanics
    res2 = bank.find_similar_questions_bm25_table(
        "How many stores", top_n=3, threshold=-10.0)
    assert res2 and isinstance(res2[0][3], dict)


def test_exact_match_fast_path(bank):
    row = bank.exact_match("Who are the board members of Zeekr?")
    assert row and row["answer"] == "The board includes An Conghui."
    assert bank.exact_match("unknown question") is None


def test_cache_invalidation(bank, tmp_path):
    import os
    import time

    q = "What is the gross margin of Zeekr in 2024?"
    assert bank.find_similar_questions_db(q)
    # append a row; bump mtime
    MemoryBank.create_db(bank.db_path, [
        {"question": "new", "question_rewritten": "brand new question xyz",
         "answer": "fresh"}])
    os.utime(bank.db_path, (time.time() + 2, time.time() + 2))
    res = bank.find_similar_questions_db("brand new question xyz",
                                         threshold=0.9)
    assert res and res[0][3] == "fresh"


def test_custom_bm25_formula():
    corpus = [["gross", "margin", "zeekr"], ["board", "members"],
              ["stores", "europe"]]
    bm = MemoryBankBM25(corpus)
    scores = bm.get_scores(["gross", "margin"])
    assert scores[0] > scores[1] == scores[2] == 0.0
    # idf uses epsilon inside the log (frequentQA.py:94)
    import math
    expected_idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 0.25)
    assert abs(bm.idf["gross"] - expected_idf) < 1e-9


def test_periods_to_dict_null_handling():
    row = {"id": 1, "question": "q", "question_rewritten": "qr",
           "is_active": True, "Y2024_Q1": None, "Y2024_Q2": "5%",
           "Y2024_Q3": "NULL"}
    assert periods_to_dict(row) == {"Y2024_Q1": "", "Y2024_Q2": "5%",
                                    "Y2024_Q3": ""}


def test_get_full_qa_by_id(bank):
    row = bank.get_full_qa_by_id(1)
    assert row["question"] == "极氪的毛利率是多少?"
    assert bank.get_full_qa_by_id(999) is None


def test_single_file_holds_both_tables(tmp_path):
    """db and qa_table in ONE sqlite file: caches must be keyed by
    (path, table), not path, or the table matchers silently search the
    frequent_qa_pairs rows."""
    one = str(tmp_path / "combined.db")
    MemoryBank.create_db(one, [
        {"question": "margin?", "question_rewritten":
         "What is the gross margin?", "answer": "13%"}])
    MemoryBank.create_table_db(one, [
        {"question": "stores", "question_rewritten":
         "How many stores are there?", "Y2024_Q3": "400"},
    ], period_columns=["Y2024_Q3"])
    b = MemoryBank(one, one)
    db_hits = b.find_similar_questions_db("What is the gross margin?")
    table_hits = b.find_similar_questions_table("How many stores are there?")
    assert db_hits and db_hits[0][3] == "13%"
    assert table_hits and table_hits[0][3] == {"Y2024_Q3": "400"}


def test_null_question_rewritten_row_does_not_break_table(tmp_path):
    path = str(tmp_path / "nulls.db")
    MemoryBank.create_db(path, [
        {"question": "only original form", "answer": "still findable"},
        {"question": "q2", "question_rewritten": "rewritten two",
         "answer": "a2"}])
    b = MemoryBank(path, None)
    hits = b.find_similar_questions_db("rewritten two")
    assert hits and hits[0][3] == "a2"
    assert b.exact_match("only original form")["answer"] == "still findable"


def test_exact_match_returns_copy(bank):
    q = "Who are the board members of Zeekr?"
    row = bank.exact_match(q)
    assert row is not None
    row["answer"] = "MUTATED"
    again = bank.exact_match(q)
    assert again["answer"] == "The board includes An Conghui."
