import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    """Deterministic synthetic code corpus (F1 'tiny'), 64 rows, 2 files."""
    from bleve_ray.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus_tiny")
    write_corpus(str(d), n_docs=64, n_files=2, seed=42)
    return str(d)
