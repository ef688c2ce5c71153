SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (483, 0.300451),
  (260, 0.298669),
  (347, 0.274508),
  (402, 0.2745),
  (497, 0.252082),
  (82, 0.2494),
  (59, 0.248708),
  (394, 0.248665),
  (71, 0.245227)
) AS golden(vec_id, score)
