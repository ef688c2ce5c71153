SELECT CAST(id AS BIGINT) AS id, CAST(rerank_score AS DOUBLE) AS rerank_score, CAST(rerank_rank AS BIGINT) AS rerank_rank FROM (VALUES
  (14, 0.8147690570375645, 1),
  (22, 0.8028980742357896, 2),
  (5, 0.8022261907456905, 3),
  (20, 0.8000495009353971, 4),
  (18, 0.7967890061523392, 5)
) AS golden(id, rerank_score, rerank_rank)
