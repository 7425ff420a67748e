"""Prompt templates for query preprocessing, QA, merging, summarization,
HyDE and training-data annotation.

Capability parity with reference src/prompts/ (qa.py, hyde.py,
auto_annotate.py): the same protocol surfaces — a strict 3-line
rewrite/date/need-RAG response, an "ANSWER:"-delimited HyDE response, the
priority rules Additional Info > Potential QA Pairs > Retrieved Context,
date-published arbitration, per-dimension breakdown, and brand-safety rules.
Texts are re-written (not copied) and parameterized by company profile
instead of hard-coding Zeekr.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import List, Optional


@dataclass
class CompanyProfile:
    """Company-specific wording injected into the templates (the reference
    hard-codes Zeekr/极氪 throughout src/prompts/qa.py)."""

    name: str = "Zeekr"
    cjk_name: str = "极氪"
    persona: str = "Colin"
    latest_data_year: int = 2024
    domain_hint: str = (
        "detailed historical and technical data about car models and "
        "electric vehicles, and information on proxy statements and "
        "prospectuses"
    )
    example_questions: List[str] = field(default_factory=lambda: [
        "What engine was used in the Mark I car?",
        "What is the user profile for Zeekr?",
        "What are the risk factors listed in the Zeekr prospectus?",
        "Can you tell me about the voting procedures for the extraordinary "
        "general meeting in the proxy statement?",
    ])


def _now() -> str:
    return datetime.now().strftime("%Y-%m-%d %H:%M:%S")


def get_if_query_rag_prompt(question: str, qa_history: str,
                            company: Optional[CompanyProfile] = None) -> str:
    """Query preprocessing: translate -> split -> rewrite -> reference date ->
    need-RAG classification, answered in a strict 3-line protocol
    (parse contract: reference vllmManager.py:148-153)."""
    c = company or CompanyProfile()
    examples = "\n".join(f'        "{q}"' for q in c.example_questions)
    return f"""You are a smart assistant that categorizes and rewrites user queries. Perform 3 steps:

1. Split and rewrite the input query into self-contained English questions.
   - Separate multiple distinct questions; translate non-English input to English first.
   - Make every question standalone: include the full subject, replace pronouns, repeat subject names.
   - Incorporate relevant context from the Q&A history and clarify vague questions.
   - Default the subject to "{c.name}" when none is given; interpret "company" or "{c.cjk_name}" as "{c.name}".
   - Add time information of the latest available data (such as "in {c.latest_data_year}") ONLY to questions about time-sensitive business metrics (financials, sales, store counts, market performance). Do NOT add time information to stable attributes (user profiles, business model, history, positioning). The latest available data is from year {c.latest_data_year}.
   - Output a JSON string list of all rewritten questions, even if there is only one.

2. Identify the reference date implied by the question and the history.
   - If no time is mentioned, use the current date.
   - Output a single date in YYYY-MM-DD format.

3. Decide whether answering needs the company dataset ({c.domain_hint}).
   - Questions about car models, electric vehicles, {c.name} company information (status, financials, stock, transactions), or proxy-statement/prospectus details: answer YES.
   - Example dataset questions:
{examples}
   - General questions (weather, general knowledge, unrelated topics): answer NO.

Here is the Q&A history:
{qa_history}

Question: {question}

Current time: {_now()}

Respond in the following format:
Line 1: a JSON array of strings for all sub-questions, e.g. ["question1", "question2"].
Line 2: the reference date in YYYY-MM-DD format.
Line 3: "YES" or "NO" — whether the question requires the dataset.

Strictly adhere to this 3-line format with no additional text."""


def get_sys_prompt(company: Optional[CompanyProfile] = None) -> str:
    c = company or CompanyProfile()
    return f"""You are {c.persona}, an LLM-driven guide for {c.name}.
You assist users with questions about {c.name}'s brand and its famous historical models.
You may receive background information from an internal human assistant for context; never quote it or mention [Internal Assistant] in responses.
Answer naturally like a human, without bullet points or unnecessary detail.
Build stakeholders' confidence in {c.name}; do not provide outdated information.
DO NOT INCLUDE ANY DETAILS THAT ARE NOT DIRECTLY RELATED TO THE QUESTION.

Current time: {_now()}"""


def get_qa_template(question: str, context: str, lang: str,
                    internal_assistant_message: str,
                    potential_qa_pairs=None,
                    company: Optional[CompanyProfile] = None) -> str:
    """Answer-generation template. Priority order and arbitration rules match
    the reference (qa.py:100-138): Additional Information > Potential QA
    Pairs > Retrieved Context; prefer newest Date Published; per-dimension
    breakdown; brand-safety rules."""
    c = company or CompanyProfile()
    potential_qa_pairs = potential_qa_pairs if potential_qa_pairs is not None else [{}]
    if context == "":
        return (f"The question might be a daily common task; answer it "
                f"confidently in {lang}, using the chat history if helpful. "
                f"If you are unsure, or the question relates to {c.name} "
                f"(cars, policies, or financial data), give a partial answer "
                f"and append: \"If you need more detailed information, our "
                f"human assistant can provide it.\"\n"
                f"        User's Question: {question}\n        ")
    return f"""## Use 'Additional information', 'Retrieved Context' and 'Potential Question Answer Pair' to answer the 'User's Question' in {lang}. 'Additional Information' has the highest priority, then 'Potential Question Answer Pair', then 'Retrieved Context'.
## 'User's Question' is: {question}

## 'Additional information' contains critical statements from an internal expert, each with a timestamp (%H-%M-%S).
- Use it when relevant; when statements conflict across sources, 'Additional Information' always wins; among its own statements prefer the latest timestamp.
# 'Additional Information' is: {internal_assistant_message}

## 'Potential Question Answer Pair' holds possibly-related QA pairs.
- Each answer carries its original question; if that question matches the user's question, use the answer directly.
- Answers may be period dictionaries like {{'Y2023_FY': '11%', 'Y2024_H': '13%', 'Y2024_Q3': '9%'}} (FY = full year, H = first half, Q = quarter).
- When a matched pair conflicts with 'Retrieved Context', the pair wins.
# 'Potential Question Answer Pair' is: {potential_qa_pairs}

## 'Retrieved Context' holds document chunks formatted as "Date Published: xxx; Chunk Content: xxx".
- When statements conflict, always rely on the chunk with the newest Date Published, and on the latest explicitly dated facts within a chunk's text; report only the current figure unless asked for historical trends.
- Do not merge information from different chunks into one sentence; present each chunk's information independently.
- If the context cannot determine the answer, fall back to your own knowledge.
- DO NOT INCLUDE ANY DETAILS THAT ARE NOT DIRECTLY RELATED TO THE QUESTION.
- Break down the answer by each category/dimension mentioned in the question; explicitly state 'no information available' for missing items.
- Company names containing '{c.name}' are written '{c.cjk_name}' in Chinese; keep person names in their original spelling.
- If reporting negative information about {c.name}, follow it with positive information or the company's response measures.

# 'Retrieved Context' is: {context}"""


def get_modify_answer_prompt(question: str, qa_pairs: str, lang: str) -> str:
    """Merge sub-answers into one response (same role as reference
    qa.py:140-157; wording is our own — downstream parsing only requires
    free-form text in ``lang``)."""
    return f"""Instructions:
Below are answers to sub-questions derived from one user question. Combine \
them into one coherent reply to the original question. Requirements: keep \
it tight and readable; state each fact once even if several sub-answers \
repeat it; do not drop any substantive detail a sub-answer contributed; \
order the material so it reads naturally; and make sure the final text \
answers the question as originally asked.

Original Question: {question}

Question-Answer Pairs:
{qa_pairs}

Respond with a well-structured, merged answer in {lang}."""


def get_summary_prompt(chat_history: str) -> str:
    """Conversation summarization (reference qa.py:159-176)."""
    return f"""You are a smart assistant that summarizes conversation history, including any retrieved (RAG) content used in the answers. Do not mix information from different retrieved paragraphs into a single sentence.

Here is the conversation history:
{chat_history}

Provide a summary that clearly represents the topics discussed, captures questions, answers, key decisions and relevant retrieved information, keeps the user's original language style, and stays brief but informative. Respond with the summary only, no labels. If the history is empty, reply that there is no chat history."""


def get_hypo_sys_prompt(num_hypo: int = 3) -> str:
    """HyDE prompt; responses are split on "ANSWER:" (parse contract:
    reference vllmManager.py:252, prompt hyde.py:2-22). One answer is
    table-formatted to steer retrieval toward table chunks."""
    answers = "\n\n".join("ANSWER: [Answer content related to the query]"
                          for _ in range(num_hypo))
    return f"""You are a highly intelligent assistant supporting retrieval of real documents. Given the user's question, create {num_hypo} hypothetical answers that are contextually relevant and could guide retrieval of real documents. Each answer must be detailed, informative, under 50 words, address a different aspect of the query, and vary in wording and structure.

Include one table answer formatted as follows:

    [Table Level]
    - Table Title: [Title]
    - Table Summary: [Brief description of the table content, data, timeframes or categories.]
    - Context: [Why the data matters and how it can be used.]
    - Special Notes: [Additional details.]

    [Row Level]
    - Row 1: [Data]
    - Row 2: [Data]

Response format:

{answers}"""


def get_annotation_prompt(question: str, chunk: str) -> str:
    """LLM auto-annotation of (query, chunk) relevance for reranker training
    data (reference src/prompts/auto_annotate.py:1-48: relevance = direct
    answer / contextual support / fuzzy-time match)."""
    return f"""You are labeling training data for a financial document reranker. Decide whether the chunk is RELEVANT to the question. A chunk is relevant if it:
1. directly answers the question,
2. provides contextual support needed to derive the answer, or
3. matches the question's subject with a fuzzy time match (e.g. the question asks 2024 and the chunk reports the latest available period).

Question: {question}
Chunk: {chunk}

Respond in the format:
Relevance: [YES or NO]
Reason: [one sentence]"""
