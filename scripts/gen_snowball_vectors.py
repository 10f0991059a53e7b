"""Regenerate tests/data/snowball_vectors.tsv from an INDEPENDENT
Snowball implementation — PostgreSQL's libstemmer build, driven through
``ts_lexize`` over a bare snowball dictionary (no stopword file).

This is the provenance script for the round-13 stemmer ground truth:
the frozen TSV was produced by exactly this pipeline, so anyone with
the postgres binaries in this container can re-derive it and diff. The
word list is deterministic: distinct corpus tokens (sf0.01 + sf0.1
documents), the curated VECTORS keys from tests/test_stemmer.py, the
english stopword list, 6k seeded random apostrophe-heavy strings, and
a curated suffix-family word list (embedded below, same as the
original run).

Words whose true Snowball stem is the empty string are EXCLUDED: the
postgres wrapper returns the input word instead of an empty lexeme, so
the TSV would record a wrapper artifact, not algorithm output.

Usage (requires the postgres system user and /usr/lib/postgresql/15):
    python scripts/gen_snowball_vectors.py [out.tsv]

The script boots a throwaway single-user cluster under /tmp, runs one
COPY round-trip, and tears it down. It never touches the repo's Spark
or engine code — independence is the point.
"""

import os
import random
import string
import subprocess
import sys
import tempfile

PG = "/usr/lib/postgresql/15/bin"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUFFIX_FAMILY_WORDS = """
relational conditional rational valencies hesitancies digitizers
conformably radically differently vilely analogously vietnamization
predication operators feudalism decisiveness hopefulness callousness
formalities sensitivities sensibilities triplicated formatively
formalized electricity electrical hopeful goodness revivals allowances
inferences airliners gyroscopic adjustably defensibly irritants
replacements adjustments dependents adoptions homologous effectively
bowdlerized communism activated generously nationalization
internationalization institutionalization characteristically
uncharacteristically antidisestablishmentarianism beautiful beautifully
abatements abilities abnormalities absorptions accompaniments
achievements acknowledgments administrations advertisements agreements
announcements appointments arguments arrangements assignments
associations assumptions attachments authorizations calculations
celebrations circumstances classifications combinations commitments
communications comparisons compensations competitions complications
concentrations conclusions configurations confirmations connections
considerations constructions contributions conversations convictions
cooperations coordinations corporations corrections correlations
correspondences delegations demonstrations descriptions destinations
determinations developments discussions distributions engagements
enhancements establishments evaluations examinations expectations
explanations expressions foundations generations governments
identifications illustrations imaginations implementations
implications impressions improvements inclinations incorporations
indications informations installations institutions instructions
integrations intentions interactions interpretations interventions
introductions investigations invitations justifications limitations
locations manifestations manipulations measurements modifications
negotiations observations occupations operations organizations
orientations participations performances permissions populations
possibilities preparations presentations preservations productions
professionals pronunciations propositions publications qualifications
quotations recommendations recognitions reflections registrations
regulations relationships representations reproductions requirements
reservations resolutions restrictions revolutions satisfactions
separations situations specifications subscriptions suggestions
transformations transitions translations transmissions
happier happiest earlier earliest luckily steadily merrily busily
flies tries spies armies babies cities countries families stories
studies boxes churches dishes matches wishes bushes foxes buzzes
quizzes knives leaves lives loaves shelves thieves wives wolves
echoes heroes potatoes tomatoes torpedoes vetoes analyses bases crises
diagnoses hypotheses oases parentheses syntheses criteria phenomena
data memoranda curricula dancing driving hiking joking managing racing
shining smiling trading writing dropped grabbed planned slipped
stopped wrapped preferred referred transferred occurred cancelled
labelled travelled modelled freely nicely truly duly wholly fully
arguing argued argues argument judging judged judges judgment noticing
noticed notices noticeable caring cared cares careful carefully
carelessness using used uses useful usefulness useless moving moved
moves movement movable having had has doing did does done being was
were been going went goes gone
""".split()


def build_vocab() -> list[str]:
    import duckdb

    sys.path.insert(0, REPO)
    from tests.test_stemmer import VECTORS

    words = set(VECTORS)
    con = duckdb.connect()
    for sf in ("0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        toks = con.execute(f"""
          select distinct lower(tok) from (
            select unnest(regexp_split_to_array(text, '[^a-zA-Z'']+')) as tok
            from read_parquet('{path}')
          ) where tok <> ''
        """).fetchall()
        words.update(t[0] for t in toks)
    stop = "/usr/share/postgresql/15/tsearch_data/english.stop"
    if os.path.exists(stop):
        words.update(w.strip() for w in open(stop))
    rng = random.Random(8)
    words.update(
        "".join(rng.choice("abcdefgyY'") for _ in range(rng.randint(1, 12))).lower()
        for _ in range(3000)
    )
    words.update(
        "".join(rng.choice(string.ascii_lowercase + "'")
                for _ in range(rng.randint(1, 15)))
        for _ in range(3000)
    )
    words.update(w.lower() for w in SUFFIX_FAMILY_WORDS)
    # extra apostrophe edge cases (the round-13 fidelity fix's shapes)
    words.update(["'sky", "'skis", "'dying", "'''", "'s'", "'ab", "'as",
                  "'gy", "'inning", "'news", "'only", "ab'cd'ef", "o''o",
                  "y'y'y", "'a", "'g'"])
    alpha = set(string.ascii_lowercase + "'")
    return sorted(w for w in words if w and set(w) <= alpha)


def pg_stems(words: list[str]) -> list[tuple[str, str]]:
    work = tempfile.mkdtemp(prefix="pgstem_")
    subprocess.run(["chown", "postgres:postgres", work], check=True)

    def as_pg(cmd: str):
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", f"cd /tmp && {cmd}"],
            capture_output=True, text=True,
        )

    try:
        r = as_pg(f"{PG}/initdb -D {work}/data -A trust -U postgres")
        if r.returncode:
            raise RuntimeError(f"initdb failed: {r.stderr[-500:]}")
        r = as_pg(
            f"{PG}/pg_ctl -D {work}/data -o '-k {work} -p 54333 "
            f"-c listen_addresses=' -l {work}/pg.log -w start"
        )
        if r.returncode:
            raise RuntimeError(f"pg start failed: {r.stderr[-500:]}")
        try:
            wf = os.path.join(work, "words.txt")
            with open(wf, "w") as fh:
                fh.write("\n".join(words))
            os.chmod(wf, 0o644)
            sql = (
                "CREATE TEXT SEARCH DICTIONARY raw_en_stem "
                "(TEMPLATE = snowball, Language = english);\n"
                "create table w(word text);\n"
                f"copy w from '{wf}';\n"
                f"\\copy (select word, (ts_lexize('raw_en_stem', word))[1] "
                f"from w order by word) to '{work}/stems.tsv'\n"
            )
            sf = os.path.join(work, "run.sql")
            with open(sf, "w") as fh:
                fh.write(sql)
            os.chmod(sf, 0o644)
            r = as_pg(
                f"{PG}/psql -h {work} -p 54333 -U postgres -qAt -f {sf}"
            )
            if r.returncode:
                raise RuntimeError(f"psql failed: {r.stderr[-500:]}")
            out = []
            for line in open(os.path.join(work, "stems.tsv")):
                w, s = line.rstrip("\n").split("\t")
                out.append((w.replace("\\'", "'"), s))
            return out
        finally:
            as_pg(f"{PG}/pg_ctl -D {work}/data -w stop")
    finally:
        subprocess.run(["rm", "-rf", work])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "snowball_vectors.tsv"
    )
    sys.path.insert(0, REPO)
    from anser_spark.functions.stemmer import porter2_stem

    vocab = build_vocab()
    print(f"vocab: {len(vocab)} words")
    pairs = pg_stems(vocab)
    lines, skipped, mismatches = [], 0, []
    for w, s in pairs:
        ours = porter2_stem(w)
        if ours == "" and s == w:
            skipped += 1  # pg wrapper refuses empty lexemes
            continue
        if ours != s:
            mismatches.append((w, s, ours))
        lines.append(f"{w}\t{s}")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} pairs to {out_path} "
          f"({skipped} empty-stem wrapper artifacts excluded)")
    if mismatches:
        print(f"WARNING: {len(mismatches)} disagreements with "
              f"porter2_stem (the pytest will fail):")
        for m in mismatches[:20]:
            print("  ", m)


if __name__ == "__main__":
    main()
