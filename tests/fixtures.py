"""Synthetic XML fixture families mirroring FIXTURES.md §2.

These reproduce the *shapes* of the reference's test documents
(reference: tests/unit/lovdata_chunker_test.py:17-141) so our chunker can
be pinned to the same behaviors.
"""

ENVELOPE = """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html>
<html lang="no">
<head><title>{title}</title></head>
<body>
{body}
</body>
</html>"""


def standard_law() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Testlov</h1>
        <section class="section">
            <h2>Kapittel 1. Innledning</h2>
            <article class="legalArticle" data-lovdata-URL="NL/lov/2024-01-01/&#167;1" id="paragraf-1">
                <h2 class="legalArticleHeader">
                    <span class="legalArticleValue">&#167; 1</span>
                    <span class="legalArticleTitle">Form&#229;l</span>
                </h2>
                <article class="legalP" id="paragraf-1-ledd-1" data-absoluteaddress="/lov/2024/&#167;1/ledd1">
                    Dette er f&#248;rste ledd i paragraf 1. Det inneholder viktig informasjon om lovens form&#229;l.
                </article>
                <article class="legalP" id="paragraf-1-ledd-2" data-absoluteaddress="/lov/2024/&#167;1/ledd2">
                    Dette er andre ledd. Det bygger videre p&#229; f&#248;rste ledd og gir ytterligere detaljer.
                </article>
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="Test Law", body=body)


def change_law() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Endringslov</h1>
        <section class="section">
            <h2>I</h2>
            <article class="legalP" id="change-1">
                I lov 15. juni 2018 nr. 40 om akvakultur gj&#248;res f&#248;lgende endringer.
            </article>
            <article class="legalP" id="change-2">
                &#167; 5 skal lyde: Dette er en endring av paragrafen.
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="Change Law", body=body)


def simple_law() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Enkel lov</h1>
        <article class="legalP" id="ledd-1">
            Dette er f&#248;rste ledd i en enkel lov.
        </article>
        <article class="legalP" id="ledd-2">
            Dette er andre ledd.
        </article>
    </main>"""
    return ENVELOPE.format(title="Simple Law", body=body)


def law_with_list() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Lov med liste</h1>
        <section class="section">
            <h2>Kapittel 1</h2>
            <article class="legalArticle" data-lovdata-URL="NL/lov/2024/&#167;1" id="paragraf-1">
                <h2 class="legalArticleHeader">
                    <span class="legalArticleValue">&#167; 1</span>
                </h2>
                <article class="legalP" id="paragraf-1-ledd-1">
                    Loven gjelder for:
                    <ol>
                        <li data-name="a)">foretak som driver virksomhet</li>
                        <li data-name="b)">personer som arbeider i slik virksomhet</li>
                        <li data-name="c)">alle andre som ber&#248;res</li>
                    </ol>
                    <p class="leddfortsettelse">Dette er en fortsettelse etter listen.</p>
                </article>
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="Law with List", body=body)


def empty_law() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Tom lov</h1>
    </main>"""
    return ENVELOPE.format(title="Empty", body=body)


def empty_body() -> str:
    return ENVELOPE.format(title="No main", body="    <p>ingen hoveddel</p>")


def law_no_title() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Uten tittel</h1>
        <section class="section">
            <h2>Kap 1</h2>
            <article class="legalArticle" id="paragraf-1">
                <h2 class="legalArticleHeader">
                    <span class="legalArticleValue">&#167; 1</span>
                </h2>
                <article class="legalP" id="paragraf-1-ledd-1">Kort ledd uten paragraftittel.</article>
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="NoTitle", body=body)


def law_with_crossrefs() -> str:
    body = """    <main class="documentBody" id="dokument">
        <h1>Lov med referanser</h1>
        <section class="section">
            <h2>Kap 1</h2>
            <article class="legalArticle" id="paragraf-1">
                <h2 class="legalArticleHeader">
                    <span class="legalArticleValue">&#167; 1</span>
                </h2>
                <article class="legalP" id="paragraf-1-ledd-1">
                    Se <a href="/lov/2020/&#167;5">lov 2020 &#167; 5</a> og
                    <a href="/lov/2018-06-15-40/&#167;2">akvakulturloven &#167; 2</a>.
                </article>
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="Refs", body=body)


def oversize_law(n_sentences: int = 100) -> str:
    long_text = " ".join(f"Dette er setning nummer {i}." for i in range(n_sentences))
    body = f"""    <main class="documentBody" id="dokument">
        <h1>Lang lov</h1>
        <section class="section">
            <article class="legalArticle" id="para-1">
                <h2 class="legalArticleHeader">
                    <span class="legalArticleValue">&#167; 1</span>
                </h2>
                <article class="legalP" id="para-1-ledd-1">
                    {long_text}
                </article>
            </article>
        </section>
    </main>"""
    return ENVELOPE.format(title="Long", body=body)


def malformed() -> str:
    return "this is << not XML at all >>"
