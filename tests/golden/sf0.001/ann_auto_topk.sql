SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (17, 0.334456),
  (225, 0.315127),
  (12, 0.311027),
  (483, 0.300451),
  (260, 0.298669),
  (73, 0.297238),
  (212, 0.281399),
  (347, 0.274508),
  (402, 0.2745)
) AS golden(vec_id, score)
