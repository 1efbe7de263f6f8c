"""Learned quality gate: CCNet-style classifier scores over documents.

Binds the pieces: ``hash_embed`` (queries/text.py, the fastText-style
signed-hash feature map) + ``logreg_fit``/``logreg_score``
(operators/classifier.py, distributed logistic regression) into the
gate the curation DAG can swap in for its heuristic quality score --
the CCNet recipe (labeled seed set -> linear model -> score the whole
corpus) with this repo's operators.

Scale shape: featurizing the seed set and fitting is
seed-set-sized (see operators/classifier.py); scoring the corpus is
ONE map-side pass -- hash_embed's single combinable aggregate to build
features, then the literal-inlined sigmoid. No stage here shuffles
document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import logreg_fit, logreg_score
from ..queries.text import hash_embed

#: hash_embed's default feature width.
FEATURE_DIM = 64

#: Default keep threshold on the sigmoid score. 0.5 is the Bayes cut
#: for a balanced seed set; CCNet instead keeps score quantiles per
#: language -- callers with skewed seeds should tune this the same way.
DEFAULT_KEEP_THRESHOLD = 0.5


def learned_quality_scores(
    docs: DataFrame,
    seed: DataFrame,
    *,
    dim: int = FEATURE_DIM,
    max_iterations: int | None = None,
) -> DataFrame:
    """(doc_id, score): P(good) for EVERY document, from a classifier
    trained on the labeled subset.

    ``docs`` needs (doc_id, text); ``seed`` needs (doc_id, label) with
    label 1 = keep-worthy, 0 = reject-worthy -- typically a few
    thousand curated examples (CCNet uses a Wikipedia dump as the
    positive class and raw crawl as the negative). Seed labels join
    the feature frame on doc_id; docs the embedding cannot place
    (empty text -> zero vector scores sigmoid(b); that is the PRIOR,
    not a pass) still get a score, so the gate covers the corpus.

    Raises :class:`~..operators.classifier.SeedSetError` when the seed
    is empty or single-class -- the caller decides whether to fall
    back to the heuristic gate or abort.
    """
    emb = hash_embed(docs.select("doc_id", "text"), dim=dim)
    train = emb.join(
        seed.select("doc_id", F.col("label").cast("double").alias("label")),
        "doc_id",
    )
    kwargs = {} if max_iterations is None else {"max_iterations": max_iterations}
    weights, bias = logreg_fit(train, dim=dim, **kwargs)
    return logreg_score(emb, weights, bias).select("doc_id", "score")
