"""Golden end-to-end flagship run on sf0.001 (reference test style:
shape + exact id sets, tests/test_string.py:78-140 analog)."""

from kg_covid_19_ray.pipelines.flagship import build_kg

EXPECTED_TERM_NODES = {
    ":streamconcept": "free-text stream concept",
    "CHEBI:15365": "aspirin",  # first-wins: 'scan' (gaz_idx 6) precedes 'dup'/'batch'
    "ComplexPortal:CPX-5742": "spike glycoprotein complex",
    "GO:0006412": "translation",
    "MONDO:0005091": "Coronavirus Infections",
    "NCBIGene:59272": "angiotensin converting enzyme 2",
    "UniProtKB:P35499": "sodium channel SCN4A isoform 2",
    "wikidata:Q159": "Russian Federation",
    "wikidata:Q183": "Germany",
}


def test_flagship_sf0001(ray_session, sf_small):
    nodes, edges = build_kg(sf_small)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()

    assert list(ndf.columns) == ["id", "name", "category", "provided_by"]
    assert list(edf.columns) == ["subject", "predicate", "object",
                                 "relation", "provided_by"]

    pubs = ndf[ndf.category == "biolink:Publication"]
    terms = ndf[ndf.category != "biolink:Publication"]
    assert len(pubs) == 500  # one publication node per page
    assert dict(zip(terms["id"], terms["name"])) == EXPECTED_TERM_NODES

    # node ids unique (reference test_drug_central.py:110-117 property)
    assert ndf["id"].is_unique
    # edges deduped on composite key
    assert not edf.duplicated().any()
    # every edge endpoint resolves to a node
    node_ids = set(ndf["id"])
    assert set(edf["subject"]) <= node_ids
    assert set(edf["object"]) <= node_ids
    # constants
    assert (edf["predicate"] == "biolink:mentions").all()
    assert (edf["relation"] == "SIO:000255").all()
    assert (edf["provided_by"] == "web_pages").all()


def test_build_kg_checkpoint_share_resumes(ray_session, sf_small, tmp_path):
    """share='checkpoint': the extracted-docs stage is written once and
    the second build resumes from the checkpoint (manifest present, no
    recompute), producing identical node/edge counts."""
    import json
    import os

    from kg_covid_19_ray.pipelines.flagship import build_kg

    ckpt = str(tmp_path / "ckpt")
    n1, e1 = build_kg(sf_small, share="checkpoint", checkpoint_dir=ckpt)
    c_nodes, c_edges = n1.count(), e1.count()

    stage_dirs = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt)
                  for f in fs if f == "manifest.json"]
    assert len(stage_dirs) == 1
    manifest = json.load(open(stage_dirs[0]))
    assert manifest["stage"] == "extracted_docs"
    assert manifest["total_rows"] > 0
    mtime = os.path.getmtime(stage_dirs[0])

    n2, e2 = build_kg(sf_small, share="checkpoint", checkpoint_dir=ckpt)
    assert (n2.count(), e2.count()) == (c_nodes, c_edges)
    # resume did not rewrite the manifest
    assert os.path.getmtime(stage_dirs[0]) == mtime
