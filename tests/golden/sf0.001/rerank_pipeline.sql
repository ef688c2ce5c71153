SELECT CAST(id AS BIGINT) AS id, CAST(rerank_score AS DOUBLE) AS rerank_score, CAST(rerank_rank AS BIGINT) AS rerank_rank FROM (VALUES
  (1, 0.814388637737009, 1),
  (13, 0.811798875644384, 2),
  (11, 0.8090352209095364, 3),
  (6, 0.8071265011204751, 4),
  (0, 0.7964459449148216, 5)
) AS golden(id, rerank_score, rerank_rank)
